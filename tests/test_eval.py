"""Eval pipeline tests: the baseline generators, metric protocol, CI,
and artifact outputs."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from srgan_st_tpu.core.config import Config
from srgan_st_tpu.eval.validate import confidence_interval, validate
from srgan_st_tpu.eval.validate import test as run_test


@pytest.fixture
def image_pairs(tmp_path, rng):
    """Write a tiny paired GT/LR test set to disk (x4, GTmod12-style)."""
    from PIL import Image

    gt_dir = tmp_path / "GTmod12"
    lr_dir = tmp_path / "LRbicx4"
    gt_dir.mkdir()
    lr_dir.mkdir()
    from srgan_st_tpu.ops.resize import resize_bicubic

    for i in range(3):
        gt = (rng.random((48, 60, 3)) * 255).astype(np.uint8)
        Image.fromarray(gt).save(gt_dir / f"img{i}.png")
        lr = resize_bicubic(jnp.asarray(gt[None], jnp.float32) / 255.0, 0.25)
        lr_u8 = np.asarray(jnp.round(lr[0] * 255).astype(jnp.uint8))
        Image.fromarray(lr_u8).save(lr_dir / f"img{i}.png")
    return str(gt_dir), str(lr_dir)


def test_confidence_interval_matches_reference_formula():
    data = [1.0, 2.0, 3.0, 4.0, 5.0]
    from statistics import NormalDist

    dist = NormalDist.from_samples(data)
    z = NormalDist().inv_cdf(0.975)
    expected = dist.stdev * z / ((len(data) - 1) ** 0.5)
    assert confidence_interval(data) == pytest.approx(expected)


def test_bicubic_baseline_end_to_end(tmp_path, image_pairs, monkeypatch):
    monkeypatch.chdir(tmp_path)
    gt_dir, lr_dir = image_pairs
    config = Config()
    config.EXP.NAME = "bicubic"
    config.DATA.TEST_GT_IMAGES_DIR = gt_dir
    config.DATA.TEST_LR_IMAGES_DIR = lr_dir
    config.DATA.TEST_SR_IMAGES_DIR = str(tmp_path / "out")

    psnr, ssim = run_test(config, save_images=True)
    # bicubic x4 on random noise is poor but finite and bounded
    assert 5 < psnr < 40
    assert 0 <= ssim <= 1
    out_dir = os.path.join(config.DATA.TEST_SR_IMAGES_DIR, "bicubic")
    assert os.path.exists(os.path.join(out_dir, "0.png"))
    metrics = open(os.path.join(out_dir, "_metrics.txt")).read()
    assert "PSNR" in metrics and "±" in metrics


def test_nearest_baseline(tmp_path, image_pairs):
    gt_dir, lr_dir = image_pairs
    config = Config()
    config.EXP.NAME = "nearest"
    config.DATA.TEST_GT_IMAGES_DIR = gt_dir
    config.DATA.TEST_LR_IMAGES_DIR = lr_dir
    config.DATA.TEST_SR_IMAGES_DIR = str(tmp_path / "out")
    psnr, ssim = run_test(config, save_images=False)
    assert np.isfinite(psnr) and np.isfinite(ssim)


def test_identity_generator_gives_inf_psnr(tmp_path, image_pairs):
    gt_dir, lr_dir = image_pairs
    config = Config()
    config.EXP.NAME = "identity"
    config.DATA.TEST_GT_IMAGES_DIR = gt_dir
    config.DATA.TEST_LR_IMAGES_DIR = lr_dir
    config.DATA.TEST_SR_IMAGES_DIR = str(tmp_path / "out")
    from srgan_st_tpu.data.pipeline import TestPairSource

    pairs = list(TestPairSource(gt_dir, lr_dir))
    # "generator" that returns the GT itself -> perfect scores
    gts = iter([gt for gt, _ in pairs])
    psnr, ssim = validate(lambda lr: next(gts), pairs, config)
    assert psnr == float("inf")
    assert ssim == pytest.approx(1.0)


class TestInferCLI:
    """eval/infer.py: the GT-free serving CLI (single image or folder,
    baseline substitution, odd-size padding, tiled mode)."""

    @pytest.fixture
    def photos(self, tmp_path, rng):
        from PIL import Image

        d = tmp_path / "photos"
        d.mkdir()
        # odd dimensions on purpose: exercises the even-pad + exact crop
        for i, (h, w) in enumerate([(13, 17), (16, 20)]):
            img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(d / f"p{i}.png")
        return str(d)

    def test_bicubic_folder(self, tmp_path, photos):
        from PIL import Image

        from srgan_st_tpu.eval.infer import main

        out = str(tmp_path / "up")
        main(["--input", photos, "--output", out,
              "--exp_name", "bicubic", "--upscale", "4"])
        a = np.asarray(Image.open(os.path.join(out, "p0_x4.png")))
        b = np.asarray(Image.open(os.path.join(out, "p1_x4.png")))
        assert a.shape == (52, 68, 3)
        assert b.shape == (64, 80, 3)

    def test_generator_weights_single_image(self, tmp_path, photos):
        from PIL import Image

        from srgan_st_tpu.eval.infer import main
        from srgan_st_tpu.models.generator import Generator
        from srgan_st_tpu.train.checkpoint import save_variables_npz

        import jax

        config = Config()
        config.MODEL.G_N_RCB = 1
        config.MODEL.G_N_CHANNEL = 8
        g = Generator.from_config(config)
        v = g.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)), train=False)
        gpath = str(tmp_path / "g.npz")
        save_variables_npz(gpath, v)

        out = str(tmp_path / "up1")
        import srgan_st_tpu.eval.infer as infer_mod

        def small_infer_fn(cfg, gpath=None):
            cfg.MODEL.G_N_RCB = 1
            cfg.MODEL.G_N_CHANNEL = 8
            return orig(cfg, gpath=gpath)

        orig = infer_mod.make_infer_fn
        infer_mod.make_infer_fn = small_infer_fn
        try:
            main(["--input", os.path.join(photos, "p0.png"),
                  "--output", out, "--gpath", gpath, "--upscale", "4"])
        finally:
            infer_mod.make_infer_fn = orig
        sr = np.asarray(Image.open(os.path.join(out, "p0_x4.png")))
        assert sr.shape == (52, 68, 3)


class TestExport:
    """eval/export.py: StableHLO serving artifacts (jax.export)."""

    def _tiny(self):
        config = Config()
        config.MODEL.G_N_RCB = 1
        config.MODEL.G_N_CHANNEL = 8
        return config

    def test_symbolic_artifact_serves_any_size(self, tmp_path, rng):
        """One shape-polymorphic artifact must reproduce the live model
        bit-exactly at multiple (batch, H, W) sizes, odd dims included
        (the gated fast paths must fall back under symbolic shapes)."""
        import jax

        from srgan_st_tpu.eval.export import (
            export_generator,
            inspect_artifact,
            load_runner,
            save_artifact,
        )
        from srgan_st_tpu.models.generator import Generator

        config = self._tiny()
        g = Generator.from_config(config)
        v = g.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)), train=False)
        blob, meta = export_generator(config, v, platforms=("cpu",))
        path = str(tmp_path / "g.srganx")
        save_artifact(path, blob, meta)

        header = inspect_artifact(path)
        assert header["upscale"] == 4 and header["platforms"] == ["cpu"]
        run = load_runner(path)
        assert run.meta["n_params"] == header["n_params"] > 0
        ref = jax.jit(lambda x: g.apply(v, x, train=False))
        for shape in [(2, 12, 20, 3), (1, 9, 7, 3)]:
            x = jnp.asarray(rng.random(shape), jnp.float32)
            got = np.asarray(run(x))
            assert got.shape == (shape[0], shape[1] * 4, shape[2] * 4, 3)
            np.testing.assert_array_equal(got, np.asarray(ref(x)))

    def test_multiplatform_and_fixed_shape_export(self, tmp_path, rng):
        """Fixed-shape export pins the input aval; cross-platform lowering
        (cpu+tpu) from the CPU host must serialize and execute on cpu."""
        import jax

        from srgan_st_tpu.eval.export import export_generator, load_runner, save_artifact
        from srgan_st_tpu.models.generator import Generator

        config = self._tiny()
        g = Generator.from_config(config)
        v = g.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)), train=False)
        blob, meta = export_generator(
            config, v, platforms=("cpu", "tpu"), fixed_shape=(1, 8, 8)
        )
        assert meta["platforms"] == ["cpu", "tpu"]
        path = str(tmp_path / "g_fixed.srganx")
        save_artifact(path, blob, meta)
        run = load_runner(path)
        x = jnp.asarray(rng.random((1, 8, 8, 3)), jnp.float32)
        assert np.asarray(run(x)).shape == (1, 32, 32, 3)
        # wrong shape must be rejected by the pinned calling convention
        with pytest.raises(Exception):
            run(jnp.zeros((1, 9, 9, 3)))

    def test_cli_and_magic_check(self, tmp_path):
        """The CLI takes no architecture flags: width/depth/upscale come
        from the checkpoint itself (derive_arch), so a non-default model
        exports with just --gpath/--out."""
        import jax

        from srgan_st_tpu.eval.export import load_runner, main
        from srgan_st_tpu.models.generator import Generator
        from srgan_st_tpu.train.checkpoint import save_variables_npz

        config = self._tiny()  # non-default: 8 channels, 1 RCB
        g = Generator.from_config(config)
        v = g.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)), train=False)
        gpath = str(tmp_path / "g.npz")
        save_variables_npz(gpath, v)
        out = str(tmp_path / "m.srganx")

        main(["--gpath", gpath, "--out", out, "--platforms", "cpu"])
        run = load_runner(out)
        assert run.meta["format"] == "srgan-st-tpu/stablehlo"
        assert run.meta["channels"] == 8
        assert run.meta["num_rcb"] == 1
        assert run.meta["upscale"] == 4
        # ...and the derived-dims artifact actually serves
        x = jnp.zeros((1, 6, 6, 3), jnp.float32)
        assert np.asarray(run(x)).shape == (1, 24, 24, 3)

        # a conflicting --upscale must error, not silently re-architect
        with pytest.raises(SystemExit, match="conflicts with the checkpoint"):
            main(["--gpath", gpath, "--out", out, "--platforms", "cpu",
                  "--upscale", "2"])

        bad = tmp_path / "bad.srganx"
        bad.write_bytes(b"not an artifact")
        with pytest.raises(ValueError, match="not a srgan-st-tpu export"):
            load_runner(str(bad))

    def test_infer_cli_derives_arch_from_checkpoint(self, tmp_path, rng):
        """eval/infer.py --gpath: the live-model path must serve a
        non-default width/depth checkpoint without architecture flags
        (same derive_arch as export; previously crashed with a
        ScopeParamShapeError against the default 64-channel config)."""
        import jax
        from PIL import Image

        from srgan_st_tpu.eval.infer import main
        from srgan_st_tpu.models.generator import Generator
        from srgan_st_tpu.train.checkpoint import save_variables_npz

        config = self._tiny()  # non-default: 8 channels, 1 RCB
        g = Generator.from_config(config)
        v = g.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)), train=False)
        gpath = str(tmp_path / "g_tiny.npz")
        save_variables_npz(gpath, v)

        img = (rng.random((10, 14, 3)) * 255).astype(np.uint8)
        inp = tmp_path / "in"
        inp.mkdir()
        Image.fromarray(img).save(inp / "q.png")
        out = str(tmp_path / "out")
        main(["--input", str(inp / "q.png"), "--output", out,
              "--gpath", gpath])
        sr = np.asarray(Image.open(os.path.join(out, "q_x4.png")))
        assert sr.shape == (40, 56, 3)

    def test_infer_cli_serves_from_artifact(self, tmp_path, rng):
        """eval/infer.py --artifact: the serving CLI must run from an
        exported artifact alone (upscale read from the header), including
        the odd-size pad/crop path."""
        import jax
        from PIL import Image

        from srgan_st_tpu.eval.export import export_generator, save_artifact
        from srgan_st_tpu.eval.infer import main
        from srgan_st_tpu.models.generator import Generator

        config = self._tiny()
        g = Generator.from_config(config)
        v = g.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)), train=False)
        blob, meta = export_generator(config, v, platforms=("cpu",))
        art = str(tmp_path / "g.srganx")
        save_artifact(art, blob, meta)

        img = (rng.random((13, 17, 3)) * 255).astype(np.uint8)  # odd dims
        inp = tmp_path / "in"
        inp.mkdir()
        Image.fromarray(img).save(inp / "p.png")
        out = str(tmp_path / "out")
        main(["--input", str(inp / "p.png"), "--output", out,
              "--artifact", art])
        sr = np.asarray(Image.open(os.path.join(out, "p_x4.png")))
        assert sr.shape == (52, 68, 3)

        # flags that reconfigure the LIVE model must be rejected on the
        # artifact path, not silently ignored (an artifact is sealed)
        for flag in ("--tiled", "--bf16"):
            with pytest.raises(SystemExit, match="does not apply"):
                main(["--input", str(inp / "p.png"), "--output", out,
                      "--artifact", art, flag])

        # --ensemble rotates inputs; a non-square fixed-shape artifact
        # cannot serve the rotated variants -> reject up front
        blob_f, meta_f = export_generator(
            config, v, platforms=("cpu",), fixed_shape=(1, 8, 12)
        )
        art_f = str(tmp_path / "g_fixed.srganx")
        save_artifact(art_f, blob_f, meta_f)
        with pytest.raises(SystemExit, match="must be square"):
            main(["--input", str(inp / "p.png"), "--output", out,
                  "--artifact", art_f, "--ensemble"])


class TestSelfEnsemble:
    """eval/ensemble.py: geometric x8 test-time augmentation."""

    def test_exact_for_equivariant_operator(self, rng):
        """For a dihedral-equivariant upscaler (nearest), the ensemble is
        exactly the plain output — pins the transform/inverse pairing."""
        from srgan_st_tpu.eval.ensemble import self_ensemble
        from srgan_st_tpu.ops.resize import nearest_upscale

        fn = lambda x: np.asarray(nearest_upscale(jnp.asarray(x), 4))  # noqa: E731
        x = rng.random((2, 6, 9, 3)).astype(np.float32)  # non-square
        np.testing.assert_array_equal(self_ensemble(fn)(x), fn(x))

    def test_averages_anisotropic_operator(self, rng):
        """For a non-equivariant fn the ensemble must differ from the
        plain output and equal the hand-computed 8-term average."""
        from srgan_st_tpu.eval.ensemble import (
            dihedral,
            dihedral_inverse,
            self_ensemble,
        )

        k = np.arange(9, dtype=np.float32).reshape(3, 3)

        def fn(x):  # anisotropic: depends on orientation
            from scipy.signal import convolve2d

            return np.stack([
                np.stack([convolve2d(img[..., c], k, mode="same")
                          for c in range(3)], -1)
                for img in x
            ])

        x = rng.random((1, 8, 8, 3)).astype(np.float32)
        got = self_ensemble(fn)(x)
        assert not np.allclose(got, fn(x))
        acc = np.zeros_like(fn(x), np.float64)
        for kk in range(4):
            for flip in (False, True):
                acc += dihedral_inverse(
                    fn(dihedral(x, kk, flip)), kk, flip
                ).astype(np.float64)
        np.testing.assert_allclose(got, (acc / 8).astype(np.float32), rtol=1e-6)

    def test_wired_into_make_generator_apply(self, rng):
        """TPU.SELF_ENSEMBLE composes in make_generator_apply."""
        import jax

        from srgan_st_tpu.eval.validate import make_generator_apply
        from srgan_st_tpu.models.generator import Generator

        config = Config()
        config.MODEL.G_N_RCB = 1
        config.MODEL.G_N_CHANNEL = 8
        g = Generator.from_config(config)
        v = g.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)), train=False)
        plain = make_generator_apply(config, v)
        config.TPU.SELF_ENSEMBLE = True
        ens = make_generator_apply(config, v)
        x = rng.random((1, 8, 8, 3)).astype(np.float32)
        a, b = np.asarray(plain(jnp.asarray(x))), ens(x)
        assert a.shape == b.shape == (1, 32, 32, 3)
        assert not np.array_equal(a, b)  # a trained-free G is anisotropic

    def test_composes_with_tiled_eval(self, rng):
        """ensemble(tiled(G)) must equal ensemble(G) to float-roundoff
        (the tiled applier pads to the tile size, which reassociates conv
        edge arithmetic at ~1e-6); pins that make_generator_apply wraps
        tiled first, ensemble outermost."""
        import jax

        from srgan_st_tpu.eval.validate import make_generator_apply
        from srgan_st_tpu.models.generator import Generator

        config = Config()
        config.MODEL.G_N_RCB = 1
        config.MODEL.G_N_CHANNEL = 8
        g = Generator.from_config(config)
        v = g.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)), train=False)
        config.TPU.SELF_ENSEMBLE = True
        ens = make_generator_apply(config, v)
        config.TPU.TILED_EVAL = True
        ens_tiled = make_generator_apply(config, v)
        x = rng.random((1, 12, 20, 3)).astype(np.float32)
        np.testing.assert_allclose(ens(x), ens_tiled(x), atol=1e-5)


def test_bf16_export_matches_live_bf16(tmp_path, rng):
    """--bf16 export embeds the bfloat16-compute graph; the artifact must
    reproduce the live bf16 model exactly (same graph, same rounding)."""
    import jax

    from srgan_st_tpu.eval.export import export_generator, load_runner, save_artifact
    from srgan_st_tpu.models.generator import Generator

    config = Config()
    config.MODEL.G_N_RCB = 1
    config.MODEL.G_N_CHANNEL = 8
    config.TPU.COMPUTE_DTYPE = "bfloat16"
    # pin the live model to the artifact's shape-agnostic formulations:
    # the symbolic-shape export falls back from the gated fast paths
    # (Pallas conv3 inner, xpack_eval trunk), whose bf16 rounding differs
    g = Generator.from_config(config).clone(
        conv3_inner=1, trunk_mode="unfused")
    v = g.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)), train=False)
    blob, meta = export_generator(config, v, platforms=("cpu",))
    assert meta["compute_dtype"] == "bfloat16"
    path = str(tmp_path / "g16.srganx")
    save_artifact(path, blob, meta)
    run = load_runner(path)
    x = jnp.asarray(rng.random((1, 10, 14, 3)), jnp.float32)
    live = jax.jit(lambda a: g.apply(v, a, train=False))(x)
    np.testing.assert_array_equal(np.asarray(run(x)), np.asarray(live))
