"""Parity tests for the loss zoo against torch-CPU goldens replicating the
reference loss.py forwards."""

import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from srgan_st_tpu.core.config import Config
from srgan_st_tpu import losses

# Stored golden loss values (see tests/goldens/README.md)
GOLD = np.load(os.path.join(os.path.dirname(__file__), "goldens", "reference_goldens.npz"))


def _pair(rng, size=24):
    """A (sr, gt) pair: gt random, sr a noisy version (realistic correlation)."""
    gt = rng.random((2, 3, size, size), dtype=np.float32)
    sr = np.clip(gt + 0.1 * rng.standard_normal(gt.shape).astype(np.float32), 0, 1)
    return sr, gt


def _nhwc(x):
    return jnp.asarray(x.transpose(0, 2, 3, 1))


class TestPixelAdversarial:
    def test_pixel(self, rng):
        sr, gt = _pair(rng)
        golden = torch.nn.MSELoss()(torch.from_numpy(sr), torch.from_numpy(gt)).item()
        got = float(losses.pixel_loss(_nhwc(sr), _nhwc(gt), criterion="mse"))
        assert abs(got - golden) < 1e-7
        golden_l1 = torch.nn.L1Loss()(torch.from_numpy(sr), torch.from_numpy(gt)).item()
        got_l1 = float(losses.pixel_loss(_nhwc(sr), _nhwc(gt), criterion="l1"))
        assert abs(got_l1 - golden_l1) < 1e-7

    def test_adversarial_matches_bce_with_logits(self, rng):
        logits = rng.standard_normal((16, 1)).astype(np.float32)
        for target in (0.9, 0.0):
            golden = torch.nn.BCEWithLogitsLoss()(
                torch.from_numpy(logits), torch.full((16, 1), target)
            ).item()
            got = float(losses.adversarial_loss(jnp.asarray(logits), target))
            assert abs(got - golden) < 1e-6


class TestBuddyLosses:
    @pytest.mark.parametrize("dist_norm,criterion,gold_key",
                             [("l2", "l1", "bb_l2_l1"), ("l1", "mse", "bb_l1_mse")])
    def test_best_buddy(self, dist_norm, criterion, gold_key):
        sr, gt = GOLD["loss_sr24"], GOLD["loss_gt24"]
        golden = float(GOLD[gold_key])
        got = float(
            losses.best_buddy_loss(
                _nhwc(sr), _nhwc(gt), dist_norm=dist_norm, criterion=criterion
            )
        )
        assert abs(got - golden) < 1e-5, (got, golden)

    def test_gram(self):
        sr, gt = GOLD["loss_sr24"], GOLD["loss_gt24"]
        golden = float(GOLD["gram"])
        got = float(losses.gram_loss(_nhwc(sr), _nhwc(gt)))
        assert abs(got - golden) < 1e-5, (got, golden)

    def test_patchwise_st(self):
        sr, gt = GOLD["loss_sr24"], GOLD["loss_gt24"]
        golden = float(GOLD["pst"])
        got = float(losses.patchwise_st_loss(_nhwc(sr), _nhwc(gt)))
        assert abs(got - golden) < 2e-4 * max(abs(golden), 1.0), (got, golden)


class TestSTLoss:
    def test_whole_image(self):
        sr, gt = GOLD["loss_sr32"], GOLD["loss_gt32"]
        golden = float(GOLD["st_loss"])
        got = float(losses.st_loss(_nhwc(sr), _nhwc(gt)))
        assert abs(got - golden) < 1e-4, (got, golden)

    def test_zero_for_identical(self, rng):
        gt = rng.random((1, 3, 32, 32), dtype=np.float32)
        got = float(losses.st_loss(_nhwc(gt), _nhwc(gt)))
        # eps floors keep it from being exactly 0
        assert got < 1e-4


class TestContentLosses:
    def test_vgg_random_init_semantics(self, rng):
        config = Config()
        config.MODEL.G_LOSS.CRITERIONS = {
            "ContentVGG": {"kind": "content_vgg", "allow_random_init": True},
        }
        crits = losses.build_criterions(config)
        fn, weight = crits["ContentVGG"]
        assert weight == 1.0
        # 48px keeps every tap layer (features.35 is stride-16: 3px maps)
        # while quartering the CPU compile+run cost of the full-depth VGG
        sr, gt = _pair(rng, size=48)
        val = float(fn(_nhwc(sr), _nhwc(gt)))
        assert val > 0
        assert float(fn(_nhwc(gt), _nhwc(gt))) == 0.0

    def test_disc_content_semantics(self, rng):
        config = Config()
        # narrow D: tap semantics are width-independent, CPU test speed
        config.MODEL.D_N_CHANNEL = 8
        config.MODEL.G_LOSS.CRITERIONS = {
            "ContentDiscriminator": {"kind": "content_disc"},
        }
        crits = losses.build_criterions(config)
        fn, weight = crits["ContentDiscriminator"]
        assert weight == 2000.0
        sr, gt = _pair(rng, size=96)
        assert float(fn(_nhwc(sr), _nhwc(gt))) > 0
        assert float(fn(_nhwc(gt), _nhwc(gt))) == 0.0


class TestRegistry:
    def test_default_config_builds(self):
        config = Config()
        crits = losses.build_criterions(config)
        assert set(crits) == {"Adversarial"}
        assert crits["Adversarial"] == (None, 0.001)

    def test_add_remove(self):
        config = Config()
        config.add_g_criterion("ST", {"kind": "st"}, weight=1 / 3)
        config.add_g_criterion("Pixel", {"kind": "pixel"}, weight=1.0)
        crits = losses.build_criterions(config)
        assert set(crits) == {"Adversarial", "ST", "Pixel"}
        config.remove_g_criterion("ST")
        assert "ST" not in config.MODEL.G_LOSS.CRITERIONS

    def test_warmup_default(self):
        config = Config()
        crits = losses.build_warmup_criterions(config)
        assert set(crits) == {"Pixel"}
        fn, w = crits["Pixel"]
        assert w == 1.0
        x = jnp.ones((1, 4, 4, 3))
        assert float(fn(x, x * 0.5)) == pytest.approx(0.25)

    def test_vgg_missing_weights_error(self):
        config = Config()
        config.MODEL.G_LOSS.CRITERIONS = {"ContentVGG": {"kind": "content_vgg"}}
        with pytest.raises(FileNotFoundError, match="convert_vgg19"):
            losses.build_criterions(config)


class TestVGGConverter:
    def test_convert_and_load_roundtrip(self, tmp_path, rng):
        """Fabricated torch-format VGG19 state dict -> npz -> flax apply."""
        import torch

        # tools/ is on sys.path via conftest
        from convert_vgg19 import convert

        from srgan_st_tpu.models.vgg import VGG19Features, load_vgg19_npz

        # minimal state dict covering features.0 .. features.17 conv layers
        conv_channels = [(3, 64), (64, 64), (64, 128), (128, 128),
                         (128, 256), (256, 256), (256, 256), (256, 256)]
        indices = [0, 2, 5, 7, 10, 12, 14, 16]
        state = {}
        for idx, (cin, cout) in zip(indices, conv_channels):
            state[f"features.{idx}.weight"] = torch.from_numpy(
                rng.random((cout, cin, 3, 3), dtype=np.float32) - 0.5
            )
            state[f"features.{idx}.bias"] = torch.from_numpy(
                rng.random((cout,), dtype=np.float32)
            )
        state["classifier.0.weight"] = torch.zeros(10, 10)  # must be ignored
        pth = str(tmp_path / "vgg.pth")
        torch.save(state, pth)
        npz = str(tmp_path / "vgg.npz")
        convert(pth, npz)

        taps = ("features.17",)
        variables = load_vgg19_npz(npz, taps)
        model = VGG19Features(taps=taps)
        x = jnp.asarray(rng.random((1, 48, 48, 3), dtype=np.float32))
        feats = model.apply(variables, x)
        assert feats["features.17"].shape == (1, 12, 12, 256)

        # golden: torch conv stack up to relu3_4
        import torch.nn.functional as TF

        t = torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))
        for i, idx in enumerate(indices):
            t = TF.conv2d(t, state[f"features.{idx}.weight"],
                          state[f"features.{idx}.bias"], padding=1)
            t = TF.relu(t)
            if idx in (2, 7):  # pools after features.3 / features.8
                t = TF.max_pool2d(t, 2)
        np.testing.assert_allclose(
            np.asarray(feats["features.17"]).transpose(0, 3, 1, 2),
            t.numpy(), rtol=1e-2, atol=10,  # values ~1e6 after 8 raw convs
        )

    def test_manifest_matches_architecture(self):
        """The checked-in manifest must equal the architecture-derived
        shapes (it is generated from expected_torch_shapes())."""
        import json
        # tools/ is on sys.path via conftest
        from convert_vgg19 import DEFAULT_MANIFEST

        from srgan_st_tpu.models.vgg import expected_torch_shapes

        with open(DEFAULT_MANIFEST) as f:
            manifest = json.load(f)
        expected = {k: list(v) for k, v in expected_torch_shapes().items()}
        assert manifest["tensors_oihw"] == expected
        assert manifest["num_features_tensors"] == 32
        assert manifest["pth_sha256_prefix"] == "dcbb9e9d"  # vgg19-dcbb9e9d.pth

    def test_manifest_verification(self, tmp_path):
        """A full fabricated IMAGENET1K_V1-shaped state dict passes
        verification (sans hash); wrong shapes error informatively."""
        import torch

        # tools/ is on sys.path via conftest
        from convert_vgg19 import DEFAULT_MANIFEST, convert, verify_against_manifest

        from srgan_st_tpu.models.vgg import expected_torch_shapes

        state = {
            k: torch.zeros(*shape)
            for k, shape in expected_torch_shapes().items()
        }
        verify_against_manifest(state, DEFAULT_MANIFEST)  # no error

        pth = str(tmp_path / "fab.pth")
        torch.save(state, pth)
        convert(pth, str(tmp_path / "fab.npz"), manifest=DEFAULT_MANIFEST,
                check_hash=False)  # fabricated bytes: hash is meaningless

        # the real-artifact hash gate must reject fabricated bytes
        with pytest.raises(ValueError, match="sha256"):
            convert(pth, str(tmp_path / "fab2.npz"), manifest=DEFAULT_MANIFEST,
                    check_hash=True)

        bad = dict(state)
        bad["features.0.weight"] = torch.zeros(64, 3, 5, 5)
        del bad["features.34.bias"]
        with pytest.raises(ValueError) as e:
            verify_against_manifest(bad, DEFAULT_MANIFEST)
        assert "features.0.weight" in str(e.value)
        assert "missing tensor features.34.bias" in str(e.value)

    def test_full_path_matches_executed_torch_semantics(self, tmp_path, rng):
        """Executed-reference parity for the whole perceptual path with
        random weights: a torch VGG19 `features` trunk built to the
        published architecture (same Sequential indices as torchvision),
        taps read with forward hooks (create_feature_extractor semantics
        for module-level nodes), inputs ImageNet-normalized, per-tap
        weighted MSE summed — reference loss.py:60-69 executed — must
        equal content_loss_vgg through tools/convert_vgg19 +
        VGG19Features on the SAME weights. torchvision itself isn't
        installed; this pins every semantic EXCEPT the pretrained values:
        the conv/relu/pool walk, tap node indexing, normalization
        constants, criterion and weighting."""
        import torch
        import torch.nn.functional as tF
        from torch import nn as tnn

        # tools/ is on sys.path via conftest
        from convert_vgg19 import convert

        from srgan_st_tpu.losses.functions import content_loss_vgg
        from srgan_st_tpu.models.vgg import (
            VGG19Features,
            _torch_indices,
            load_vgg19_npz,
        )

        torch.manual_seed(0)
        mods, cin = [], 3
        for _idx, kind, ch in _torch_indices():
            if kind == "conv":
                mods += [tnn.Conv2d(cin, ch, 3, padding=1), tnn.ReLU()]
                cin = ch
            else:
                mods.append(tnn.MaxPool2d(2, 2))

        class _VGG(tnn.Module):
            def __init__(self):
                super().__init__()
                self.features = tnn.Sequential(*mods)

        ref = _VGG().eval()

        layer_weights = {"features.17": 1 / 8, "features.26": 1 / 4,
                         "features.35": 1 / 2}  # the config default
        feats: dict[str, torch.Tensor] = {}
        for t in layer_weights:
            ref.features[int(t.split(".")[1])].register_forward_hook(
                lambda _m, _i, out, t=t: feats.__setitem__(t, out)
            )
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

        sr = rng.random((2, 48, 48, 3), dtype=np.float32)
        gt = rng.random((2, 48, 48, 3), dtype=np.float32)

        def torch_feats(x):
            t = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
            with torch.no_grad():
                ref.features((t - mean) / std)
            return {k: v.clone() for k, v in feats.items()}

        sr_f, gt_f = torch_feats(sr), torch_feats(gt)
        expected = sum(
            w * tF.mse_loss(sr_f[t], gt_f[t]).item()
            for t, w in layer_weights.items()
        )

        pth = str(tmp_path / "vgg_rand.pth")
        torch.save(ref.state_dict(), pth)
        npz = str(tmp_path / "vgg_rand.npz")
        convert(pth, npz)
        taps = tuple(layer_weights)
        variables = load_vgg19_npz(npz, taps)
        model = VGG19Features(taps=taps)
        got = float(content_loss_vgg(
            jnp.asarray(sr), jnp.asarray(gt),
            vgg_apply=lambda z: model.apply(variables, z),
            layer_weights=layer_weights,
        ))
        np.testing.assert_allclose(got, expected, rtol=2e-4)
