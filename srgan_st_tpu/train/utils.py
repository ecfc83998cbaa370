"""Driver helpers."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from srgan_st_tpu.ops.resize import resize_bicubic


def make_test_pairs(config):
    """Eval pairs: the configured paired test set, or — in synthetic mode —
    a handful of deterministic (gt, lr) pairs degraded with the exact
    training degradation so validation stays meaningful in tests/bench."""
    if not config.DATA.SYNTHETIC:
        from srgan_st_tpu.data.pipeline import TestPairSource

        return TestPairSource(
            config.DATA.TEST_GT_IMAGES_DIR, config.DATA.TEST_LR_IMAGES_DIR
        )
    rng = np.random.default_rng(config.DATA.SEED + 1)
    size = config.DATA.GT_IMAGE_SIZE
    pairs = []
    for _ in range(3):
        gt = rng.random((1, size, size, 3)).astype(np.float32)
        lr = np.asarray(
            resize_bicubic(jnp.asarray(gt), 1.0 / config.DATA.UPSCALE_FACTOR)
        )
        pairs.append((gt, lr))
    return pairs
