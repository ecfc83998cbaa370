"""Bound the e2e-stream data path against the host->device link.

VERDICT r4 item 5: e2e-stream measures 1,039 patches/s/chip vs e2e-packed
5,932 (BENCH_SUITE.md) — is the gap the tunneled chip's host->device link
(PERF.md §6 measured ~40-70 MB/s for unique bytes) or data-path overhead
we can still recover?

Three measurements, same uint8 chunk geometry as the training stream
(k x B x 96 x 96 x 3 = 27.6 KB/patch):

  1. raw link: device_put of FRESH uint8 chunks (unique bytes, nothing
     else on the device) -> MB/s. The unbeatable ceiling for any path
     that ships every patch.
  2. producer path: the actual pipeline (host mmap gather + device_put on
     the prefetch thread) with a TRIVIAL consumer (sum) -> patches/s.
     Isolates the data path from training compute.
  3. overlap check: the producer path while a compute chain occupies the
     device -> does the transfer hide behind compute or serialize?

Timing discipline: PERF.md §3c (fresh operands per put — the tunnel
dedups repeated identical transfers; fetch barriers end every region).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_stream.py
"""

from __future__ import annotations

import sys
import time

import numpy as np


def fetch(x) -> float:
    import jax.numpy as jnp

    return float(jnp.sum(x.astype(jnp.float32)) if hasattr(x, "astype")
                 else jnp.sum(jnp.asarray(x)))


def bench_raw_link(n_chunks: int = 8, k: int = 100, b: int = 16) -> float:
    """MB/s of device_put for fresh (k, b, 96, 96, 3) uint8 chunks."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    shape = (k, b, 96, 96, 3)
    nbytes = int(np.prod(shape))
    # fresh unique bytes per put (dedup-proof); pregenerate so host RNG
    # time stays out of the measured region
    chunks = [rng.integers(0, 256, shape, np.uint8) for _ in range(n_chunks)]
    # warmup: one put + a consuming fetch finalizes the path
    dev = jax.device_put(chunks[0])
    fetch(dev[0, 0, :8, :8])
    start = time.perf_counter()
    devs = [jax.device_put(c) for c in chunks]
    # consume one element of each transferred buffer -> all puts complete
    s = jnp.stack([d[0, 0, 0, 0, 0] for d in devs]).sum()
    fetch(s)
    elapsed = time.perf_counter() - start
    mbs = n_chunks * nbytes / elapsed / 1e6
    print(f"raw link: {n_chunks} x {nbytes/1e6:.1f} MB fresh uint8 chunks "
          f"in {elapsed:.2f} s -> {mbs:.1f} MB/s "
          f"({mbs*1e6/(96*96*3):,.0f} patches/s equivalent)", flush=True)
    return mbs


def bench_producer(epochs: int = 2, k: int = 100, b: int = 16) -> float:
    """The real stream pipeline (DATA.DEVICE_CACHE=False) feeding a
    trivial consumer: patches/s the data path alone sustains."""
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import _ensure_pack, _make_config
    from srgan_st_tpu.data.pipeline import make_train_source
    from srgan_st_tpu.parallel.mesh import make_mesh
    from srgan_st_tpu.train.utils import iter_chunks

    config = _make_config("headline")
    config.DATA.BATCH_SIZE = b
    config.DATA.SYNTHETIC = False
    config.DATA.DEVICE_CACHE = False
    pack = _ensure_pack("/tmp/srgan_e2e_pack/patches.pack.npy")
    import os

    config.DATA.TRAIN_GT_IMAGES_DIR = os.path.dirname(pack)
    mesh = make_mesh(config)
    source = make_train_source(config)

    # warmup epoch 0 chunk
    it = iter_chunks(source, 0, k, mesh=mesh)
    warm = next(it)
    it.close()
    fetch(warm[0, 0, :8, :8])

    patches = 0
    start = time.perf_counter()
    last = None
    for epoch in range(1, 1 + epochs):
        for chunk in iter_chunks(source, epoch, k, mesh=mesh):
            last = chunk
            patches += chunk.shape[0] * chunk.shape[1]
    # consume the final chunk -> all transfers complete
    fetch(jnp.asarray(last)[0, 0, 0, 0, 0])
    elapsed = time.perf_counter() - start
    rate = patches / elapsed
    mbs = rate * 96 * 96 * 3 / 1e6
    print(f"producer path (mmap gather + device_put, trivial consumer): "
          f"{patches} patches in {elapsed:.2f} s -> {rate:,.0f} patches/s "
          f"({mbs:.1f} MB/s)", flush=True)
    return rate


def main() -> None:
    import jax

    print("devices:", jax.devices(), flush=True)
    mbs = bench_raw_link()
    rate = bench_producer()
    link_equiv = mbs * 1e6 / (96 * 96 * 3)
    print(f"verdict: producer path = {100*rate/link_equiv:.0f}% of the raw "
          f"device_put link at the same chunk geometry", flush=True)


if __name__ == "__main__":
    main()
