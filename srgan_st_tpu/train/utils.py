"""Driver helpers."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from srgan_st_tpu.ops.resize import resize_bicubic


def chunked_batches(epoch_iter, chunk_size: int):
    """Group an epoch's (B, ...) batches into (K, B, ...) stacked chunks for
    the device-side scan steps (K = chunk_size; the final chunk may be
    smaller — it compiles once per distinct size)."""
    buf = []
    for batch in epoch_iter:
        buf.append(batch)
        if len(buf) == chunk_size:
            yield np.stack(buf)
            buf.clear()
    if buf:
        yield np.stack(buf)


def resolve_chunk_steps(config, interval: int, steps_per_epoch: int) -> int:
    """Chunk size: TPU.CHUNK_STEPS override, else the natural interval
    (D_UPDATE_INTERVAL for GAN, LOG_TRAIN_PERIOD for warmup), capped to the
    epoch length."""
    chunk = config.TPU.get("CHUNK_STEPS") or interval
    return max(1, min(chunk, steps_per_epoch))


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
