"""Aux subsystem tests: profiling meter, finite checks, viz tools."""

import numpy as np
import pytest

import jax.numpy as jnp


class TestThroughput:
    def test_meter_counts_after_warmup(self):
        from srgan_st_tpu.utils.profiling import ThroughputMeter

        meter = ThroughputMeter(n_chips=2, warmup_steps=2)
        assert meter.patches_per_sec_per_chip == 0.0
        for _ in range(5):
            meter.step(16)
        assert meter.patches_per_sec_per_chip > 0


class TestFiniteChecks:
    def test_check_finite_tree_raises_with_path(self):
        from srgan_st_tpu.utils.debugging import check_finite_tree

        ok = {"a": np.ones(3, np.float32), "b": {"c": np.zeros(2, np.float32)}}
        check_finite_tree(ok)  # no raise
        bad = {"a": np.ones(3, np.float32), "b": {"c": np.array([1.0, np.nan])}}
        with pytest.raises(FloatingPointError, match="c"):
            check_finite_tree(bad, "state")

    def test_nan_guard_passthrough(self):
        from srgan_st_tpu.utils.debugging import nan_guard

        def step(state, x):
            return state + 1, {"loss": jnp.asarray(x).sum()}

        guarded = nan_guard(step)
        state, metrics = guarded(0, jnp.ones(3))
        assert state == 1
        assert float(metrics["loss"]) == 3.0


class TestViz:
    def test_save_image_patch(self, tmp_path, rng, monkeypatch):
        from PIL import Image

        from srgan_st_tpu.core.config import Config
        from srgan_st_tpu.viz.save_image_patch import save_image_patch

        monkeypatch.chdir(tmp_path)
        gt_dir = tmp_path / "gt"
        lr_dir = tmp_path / "lr"
        gt_dir.mkdir()
        lr_dir.mkdir()
        gt = (rng.random((192, 192, 3)) * 255).astype(np.uint8)
        Image.fromarray(gt).save(gt_dir / "im.png")
        Image.fromarray(gt[::4, ::4]).save(lr_dir / "im.png")

        config = Config()
        config.DATA.TEST_GT_IMAGES_DIR = str(gt_dir)
        config.DATA.TEST_LR_IMAGES_DIR = str(lr_dir)

        written = save_image_patch(
            config, ["gt", "bicubic", "nearest"], "im.png", y=10, x=20,
            patch_size=64, out_dir=str(tmp_path / "figs"),
        )
        assert len(written) == 4  # box + 3 crops
        with Image.open(written[1]) as im:
            assert im.size == (64, 64)
        # the gt crop is exact
        with Image.open(written[1]) as im:
            np.testing.assert_array_equal(np.asarray(im), gt[10:74, 20:84])

    def test_training_curves_from_jsonl(self, tmp_path):
        import json

        from srgan_st_tpu.viz.training_curves import load_scalars, plot_curves

        log_dir = tmp_path / "tensorboard" / "exp1"
        log_dir.mkdir(parents=True)
        with open(log_dir / "scalars.jsonl", "w") as f:
            for step, val in [(1, 25.0), (2, 27.5), (3, 28.0)]:
                f.write(json.dumps({"ts": 0, "tag": "Test/PSNR", "value": val,
                                    "step": step}) + "\n")
        series = load_scalars(str(log_dir))
        assert series["Test/PSNR"] == [(1, 25.0), (2, 27.5), (3, 28.0)]
        out = plot_curves(["exp1"], ["Test/PSNR"], str(tmp_path / "c.png"),
                          tb_root=str(tmp_path / "tensorboard"))
        import os

        assert os.path.exists(out)
