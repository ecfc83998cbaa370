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


def iter_chunks(source, epoch_idx: int, chunk_size: int, put=None,
                mesh=None):
    """The drivers' chunk iterator, fastest available path first:

    1. HBM-resident gathers (`epoch_chunks_device`, PackedPatchSource with
       device_cache on + a mesh): the pack lives on-device; the host ships
       only int32 index arrays.
    2. Chunk-native streaming (`epoch_chunks`): each chunk is gathered as
       one fancy-index and `put` (the host->device transfer) runs on the
       source's prefetch thread, so the dispatch loop only dequeues
       device-ready chunks.
    3. Fallback: consumer-side stacking + put.

    `put` defaults to sharding over `mesh` when a mesh is given. A
    caller-supplied `put` (a host-side transform) disables the
    device-cache fast path — on-device gathers never materialize a host
    chunk for `put` to see, so silently skipping it would be wrong."""
    custom_put = put is not None
    if mesh is not None and put is None:
        from srgan_st_tpu.parallel.mesh import shard_chunk

        put = lambda c: shard_chunk(c, mesh)  # noqa: E731
    if (mesh is not None and not custom_put
            and getattr(source, "device_cache", False)):
        yield from source.epoch_chunks_device(epoch_idx, chunk_size, mesh)
        return
    if hasattr(source, "epoch_chunks"):
        yield from source.epoch_chunks(epoch_idx, chunk_size, put)
        return
    for chunk in chunked_batches(source.epoch(epoch_idx), chunk_size):
        yield put(chunk) if put is not None else chunk


def resolve_chunk_steps(config, interval: int, steps_per_epoch: int) -> int:
    """Chunk size: TPU.CHUNK_STEPS override, else the natural interval
    (D_UPDATE_INTERVAL for GAN, LOG_TRAIN_PERIOD for warmup), capped to the
    epoch length. An override is normalized to a divisor of the interval —
    chunk boundaries are the only points where the D update / log check
    runs, so a non-divisor would silently skip interval hits (e.g.
    CHUNK_STEPS=64 with interval 100 lands on a multiple of 100 only every
    1600 batches)."""
    import math

    chunk = config.TPU.get("CHUNK_STEPS") or interval
    chunk = max(1, min(chunk, steps_per_epoch))
    # Interval multiples can only fall mid-chunk when the epoch actually
    # contains one beyond batch 0 (epoch starts are always chunk starts).
    if steps_per_epoch > interval and (chunk > interval or interval % chunk):
        normalized = math.gcd(min(chunk, interval), interval)
        print(
            f"TPU.CHUNK_STEPS={chunk} does not divide the interval "
            f"{interval}; using {normalized} to keep the update cadence"
        )
        chunk = normalized
    return chunk


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
