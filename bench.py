"""Headline benchmark: SRGAN x4 training throughput, patches/sec/chip.

Measures the full jitted GAN training step at the reference's training
configuration (SURVEY.md §6: batch 16 per chip, 96^2 GT patches, x4
upscale, D updated every SOLVER.D_UPDATE_INTERVAL=100 steps) including the
on-device /255 + MATLAB-bicubic degradation that replaces the reference's
CPU dataloader work. Synthetic device-fed batches isolate accelerator
throughput; the host pipeline only ships uint8 patches.

Default run (the driver contract) prints ONE JSON line for the headline
config (criterions = Adversarial + Pixel, the reference's default GAN
loop, train.py:131-141 with config.py:71-73). `python bench.py --suite`
additionally benches the research configs (one JSON line each, and a
summary table to BENCH_SUITE.md):

  * flagship-st: Adversarial + Pixel + PatchwiseST + ContentDiscriminator —
    the reference's research loop (loss.py:292-375 + loss.py:230-287),
    with the fused Pallas buddy-select kernel (production default on TPU);
  * flagship-st-xla: same config with the buddy selection forced onto the
    XLA path (kernels/buddy_select.py disabled) — the Pallas-vs-XLA A/B;
  * gram-vgg: Adversarial + Pixel + Gram + ContentVGG — the GramGAN recipe
    (loss.py:146-225 + loss.py:11-74). VGG19 runs with converted weights
    when weights/vgg19_imagenet.npz exists, else random init (identical
    cost — this is a throughput bench).

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
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_A100_PATCHES_PER_SEC = 312.0  # measured; see module docstring
WARMUP_ITERS = 2
MEASURE_ITERS = 5


def fetch_barrier(tree) -> float:
    """TRUE completion barrier: fetch a scalar reduced from one leaf.

    On the axon tunnel `jax.block_until_ready` is a NO-OP while the
    executable's background second-stage compile is in flight (measured:
    returns in 0.000s with 59s of queued work; PERF.md "bench
    methodology"). Only a device->host VALUE FETCH reliably waits — and
    once one fetch has finalized the executable, block_until_ready works
    again. Every warmup and every timed region must therefore END with a
    fetch, not a block."""
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def _make_config(name: str):
    from srgan_st_tpu.core.config import Config

    config = Config()
    config.add_g_criterion("Pixel", {"kind": "pixel"}, 1.0)
    if name in ("flagship-st", "flagship-st-xla"):
        pallas = name == "flagship-st"
        config.add_g_criterion(
            "PatchwiseST", {"kind": "patchwise_st", "pallas": pallas}, 100.0
        )
        config.add_g_criterion(
            "ContentDiscriminator", {"kind": "content_disc"}, 2000.0
        )
    elif name == "gram-vgg":
        config.add_g_criterion("Gram", {"kind": "gram"}, 500.0)
        # BENCH_VGG_PAIR=0|1 A/Bs the frozen-pair single-forward VGG vs
        # the two-forward autodiff path (default: two-forward — the pair
        # lost its on-chip A/B 2,642 vs 2,680, ONCHIP_r03.log)
        spec = {"kind": "content_vgg", "allow_random_init": True}
        if os.environ.get("BENCH_VGG_PAIR"):
            spec["pair"] = os.environ["BENCH_VGG_PAIR"] == "1"
        config.add_g_criterion("ContentVGG", spec, 1.0)
    elif name != "headline":
        raise ValueError(name)
    return config


def measure(name: str) -> dict:
    """Bench one config; returns the result record."""
    import jax

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

    config = _make_config(name)
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    config.TPU.COMPUTE_DTYPE = dtype
    # trunk-path A/B (None = auto, "unfused"/"packed"/"fused")
    config.TPU.TRUNK_MODE = os.environ.get("BENCH_TRUNK") or None
    # conv3 inner-path A/B ("1"/"2"/"pallas"/"pallas-tiled"; None = auto)
    _c3 = os.environ.get("BENCH_CONV3")
    if _c3:
        config.TPU.CONV3_INNER = int(_c3) if _c3.isdigit() else _c3

    n_chips = len(jax.devices())
    # reference batch per chip (16); BENCH_BATCH overrides for capability
    # measurements at larger per-chip batches (not the parity recipe)
    per_chip_batch = int(os.environ.get("BENCH_BATCH", "16"))
    config.DATA.BATCH_SIZE = per_chip_batch * n_chips

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
    # the measured loop is a true data-dependent chain); the barrier is a
    # VALUE FETCH — see fetch_barrier
    for _ in range(WARMUP_ITERS):
        state, metrics = chunk_fn(state, chunk, True)
    fetch_barrier(metrics)

    start = time.perf_counter()
    for _ in range(MEASURE_ITERS):
        state, metrics = chunk_fn(state, chunk, True)
    fetch_barrier(metrics)
    elapsed = time.perf_counter() - start

    patches = MEASURE_ITERS * k * config.DATA.BATCH_SIZE
    per_chip = patches / elapsed / n_chips
    crits = "+".join(config.MODEL.G_LOSS.CRITERIONS)
    return {
        "metric": "train_patches_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": f"patches/s/chip (SRGAN x4, 96px GT, batch {per_chip_batch}/chip, {crits}, {dtype})",
        "vs_baseline": round(per_chip / BASELINE_A100_PATCHES_PER_SEC, 2),
        "config": name,
    }


def _ensure_pack(path: str, n_patches: int = 12800, size: int = 96,
                 seed: int = 7) -> str:
    """Procedural packed dataset for the disk->device bench: band-limited
    patterns + noise (uint8), written once to a `patches.pack.npy`."""
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    out = np.empty((n_patches, size, size, 3), np.uint8)
    chunk = 512
    for lo in range(0, n_patches, chunk):
        n = min(chunk, n_patches - lo)
        fx = rng.uniform(0.02, 0.3, (n, 3, 1, 1)).astype(np.float32)
        fy = rng.uniform(0.02, 0.3, (n, 3, 1, 1)).astype(np.float32)
        ph = rng.uniform(0, 2 * np.pi, (n, 3, 1, 1)).astype(np.float32)
        img = 0.5 + 0.35 * np.sin(fx * xx + fy * yy + ph)
        img = img + rng.normal(0, 0.04, img.shape).astype(np.float32)
        out[lo:lo + n] = (np.clip(img, 0, 1) * 255).round().astype(
            np.uint8).transpose(0, 2, 3, 1)
    np.save(path, out)
    return path


def measure_e2e(stream: bool = False) -> dict:
    """Disk->device train throughput: identical device work to the
    headline config, but batches come from a packed patch archive through
    the production input path — the full `train()` driver data flow.
    Proves the input pipeline sustains the accelerator rate (the
    reference's bottleneck was exactly this path, dataset.py:27-28:
    312 patches/s of per-sample CPU decode+bicubic).

    Default: the HBM-resident path (DATA.DEVICE_CACHE auto; the pack is
    staged on-device once and batches gather there — the host ships only
    index arrays). `stream=True` forces host-side mmap gathers + full
    uint8 chunk transfers; on this environment that row measures the
    tunneled chip's ~50 MB/s host->device link for unique data (a real
    TPU host's DMA sustains the device rate on this path too)."""
    import jax

    from srgan_st_tpu.data.pipeline import make_train_source
    from srgan_st_tpu.losses.registry import build_criterions
    from srgan_st_tpu.models.discriminator import Discriminator
    from srgan_st_tpu.models.generator import Generator
    from srgan_st_tpu.parallel.mesh import make_mesh, replicated
    from srgan_st_tpu.train.steps import (
        create_gan_state,
        make_d_optimizer,
        make_g_optimizer,
        make_gan_chunk_step,
    )
    from srgan_st_tpu.train.utils import iter_chunks

    config = _make_config("headline")
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    config.TPU.COMPUTE_DTYPE = dtype
    config.TPU.TRUNK_MODE = os.environ.get("BENCH_TRUNK") or None
    # conv3 inner-path A/B ("1"/"2"/"pallas"/"pallas-tiled"; None = auto)
    _c3 = os.environ.get("BENCH_CONV3")
    if _c3:
        config.TPU.CONV3_INNER = int(_c3) if _c3.isdigit() else _c3
    n_chips = len(jax.devices())
    per_chip_batch = 16
    config.DATA.BATCH_SIZE = per_chip_batch * n_chips
    config.DATA.SYNTHETIC = False
    if stream:
        config.DATA.DEVICE_CACHE = False
    pack = _ensure_pack(
        os.environ.get("BENCH_PACK", "/tmp/srgan_e2e_pack/patches.pack.npy")
    )
    config.DATA.TRAIN_GT_IMAGES_DIR = os.path.dirname(pack)

    mesh = make_mesh(config)
    g_model = Generator.from_config(config)
    d_model = Discriminator.from_config(config)
    g_tx = make_g_optimizer(config, 1000)
    d_tx = make_d_optimizer(config, 1000)
    state = jax.device_put(
        create_gan_state(config, g_model, d_model, g_tx, d_tx), replicated(mesh)
    )
    chunk_fn = jax.jit(
        make_gan_chunk_step(config, g_model, d_model,
                            build_criterions(config), g_tx, d_tx),
        donate_argnums=0,
        static_argnums=2,
    )
    source = make_train_source(config)
    k = config.SOLVER.D_UPDATE_INTERVAL

    # compile on epoch 0's first chunk (and stage the resident pack)
    it = iter_chunks(source, 0, k, mesh=mesh)
    warm = next(it)
    it.close()
    metrics = None
    for _ in range(WARMUP_ITERS):
        state, metrics = chunk_fn(state, warm, True)
    fetch_barrier(metrics)

    epochs = 2
    patches = 0
    start = time.perf_counter()
    for epoch in range(1, 1 + epochs):
        batch_num = 0
        for chunk in iter_chunks(source, epoch, k, mesh=mesh):
            do_d = batch_num % k == 0
            state, metrics = chunk_fn(state, chunk, do_d)
            batch_num += len(chunk)
            patches += chunk.shape[0] * chunk.shape[1]
    fetch_barrier(metrics)
    elapsed = time.perf_counter() - start
    per_chip = patches / elapsed / n_chips
    path = ("host mmap stream" if stream else "HBM-resident pack")
    return {
        "metric": "train_patches_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": (f"patches/s/chip (e2e disk->device, {path}, full driver "
                 f"data path, batch {per_chip_batch}/chip, "
                 f"Adversarial+Pixel, {dtype})"),
        "vs_baseline": round(per_chip / BASELINE_A100_PATCHES_PER_SEC, 2),
        "config": "e2e-stream" if stream else "e2e-packed",
    }


def measure_infer() -> dict:
    """Serving throughput: eval-mode x4 SR of 4K output (960x540 LR ->
    3840x2160 HR), batch-1 whole-image (the reference's serving shape,
    validate.py:73-77), bf16, single chip. Reported in HR megapixels/s.

    Timing discipline (all learned the hard way, PERF.md "bench
    methodology"): the next input mixes the 4x4-average-pool of the
    PREVIOUS output frame (a dependency that CONSUMES EVERY HR pixel)
    with a fresh noise frame per step (the chain never repeats a value).
    Three broken chains preceded it, each defeated by a different layer:
    `x + 0.0 * mean(sr)` was algebraically folded and the generator
    DCE'd (34,306 / 60,000+ MP/s — petaFLOP/s-impossible); the strided
    slice `sr[:, ::4, ::4]` let XLA slice-propagate through conv3 + the
    pixel-shuffles and compute ~1/16 of the net (20,872 MP/s); the pure
    pool chain CONVERGED — clamp [0, 1] + pooling reach a bit-exact
    fixed point in ~10 frames, the dispatches become identical, and the
    axon tunnel dedups them (43,006 MP/s). Warmup also counts DISPATCHES,
    not calls-until-ready (the tunnel's background second-stage compile
    runs ~1s into a fresh executable's life).

    vs_baseline anchor: the generator forward is ~0.28 MFLOP/HR pixel
    (conv1 9x9 + 16 RCBs + upsample stack + conv3 9x9 at HR); an A100 at
    the same generous 25% TF32 utilization used for the training compute
    anchor gives ~39 TF/s -> ~139 MP/s."""
    import jax
    import jax.numpy as jnp

    from srgan_st_tpu.models.generator import Generator

    infer_anchor_mps = 139.0
    config = _make_config("headline")
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    config.TPU.COMPUTE_DTYPE = dtype
    g_model = Generator.from_config(config)
    h, w, s = 540, 960, config.DATA.UPSCALE_FACTOR

    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.random((1, h, w, 3), np.float32))
    noise = jnp.asarray(rng.random((8, 1, h, w, 3), np.float32))
    variables = g_model.init(jax.random.key(0), lr[:, :24, :24], train=False)
    variables = jax.device_put(variables)

    @jax.jit
    def step(v, x, z, i):
        sr = g_model.apply(v, x, train=False)
        # next LR frame = 4x4 average pool of this SR frame (consumes
        # every HR pixel) mixed with a fresh noise frame; the strictly
        # increasing scalar i makes every dispatch's operands distinct
        # even if the image iterates ever cycled
        b, hh, ww, c = sr.shape
        pooled = sr.reshape(b, hh // s, s, ww // s, s, c).mean((2, 4))
        return (0.5 * pooled + 0.5 * z + 1e-7 * i).astype(x.dtype)

    n = 0
    for _ in range(12):  # past the tunnel's background-compile bleed
        lr = step(variables, lr, noise[n % 8], jnp.float32(n))
        n += 1
    fetch_barrier(lr)
    iters = 20
    start = time.perf_counter()
    for _ in range(iters):
        lr = step(variables, lr, noise[n % 8], jnp.float32(n))
        n += 1
    fetch_barrier(lr)
    elapsed = time.perf_counter() - start

    mps = iters * (h * s) * (w * s) / elapsed / 1e6 / len(jax.devices())
    return {
        "metric": "infer_hr_megapixels_per_sec_per_chip",
        "value": round(mps, 2),
        "unit": (f"HR MP/s/chip (x4 SR serving, 960x540->3840x2160, "
                 f"batch-1 whole image, eval mode, {dtype})"),
        "vs_baseline": round(mps / infer_anchor_mps, 2),
        "config": "infer-4k",
    }


def main() -> None:
    if "--only" in sys.argv:  # one named row (incl. e2e-packed/e2e-stream)
        name = sys.argv[sys.argv.index("--only") + 1]
        if name.startswith("e2e"):
            record = measure_e2e(stream=name == "e2e-stream")
        elif name.startswith("infer"):
            record = measure_infer()
        else:
            record = measure(name)
        print(json.dumps(record))
        return
    if "--suite" not in sys.argv:
        record = measure("headline")
        record.pop("config")
        print(json.dumps(record))
        return

    names = ["headline", "flagship-st", "flagship-st-xla", "gram-vgg"]
    records = []
    for name in names:
        record = measure(name)
        records.append(record)
        print(json.dumps(record), flush=True)
    for stream in (False, True):
        record = measure_e2e(stream=stream)
        records.append(record)
        print(json.dumps(record), flush=True)
    record = measure_infer()
    records.append(record)
    print(json.dumps(record), flush=True)

    lines = [
        "# Bench suite (TPU, single chip)",
        "",
        "Full jitted GAN chunk step (D cadence amortized), on-device",
        "degradation included. Generated by `python bench.py --suite`.",
        "",
        "| config | value | vs measured A100 anchor |",
        "|---|---|---|",
    ]
    for r in records:
        lines.append(f"| {r['config']} ({r['unit']}) | {r['value']} | {r['vs_baseline']}x |")
    lines += [
        "",
        "Notes:",
        "- e2e-stream is LINK-BOUND on this tunneled host: the row sits",
        "  at ~70-80% of the measured 1,494 patches/s producer-path",
        "  ceiling (`tools/bench_stream.py`; PERF.md §6). The r4",
        "  1,678 → 1,039 drop was the fetch-barrier timing fix deflating",
        "  an inflated number (transfers overlapping untimed warmup).",
        "- infer-4k's anchor is DERIVED (A100 at an assumed 25% TF32",
        "  utilization), not measured; per-op bound + attack ledger in",
        "  PERF.md §3d. Every measured-anchor row is 9-19x ahead.",
    ]
    with open("BENCH_SUITE.md", "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
