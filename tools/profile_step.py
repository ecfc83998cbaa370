"""Per-op TPU profile of the GAN training step.

Runs the jitted GAN chunk step (bench.py's headline config by default)
under a jax.profiler trace and aggregates per-op device time from the
xplane via jax.profiler.ProfileData — no tensorboard/xprof needed.

Usage:
    python tools/profile_step.py [config] [top_n] [with_d]
      config: headline | flagship-st | flagship-st-xla | gram-vgg
              | infer-4k (eval-mode serving forward, 960x540->4K batch-1)
      with_d: "1" to include the (1/100-amortized) D update in the chunk

Timing discipline (PERF.md "bench methodology"): warmup counts
DISPATCHES (>= 12, past the axon tunnel's background second-stage
compile) and ends with a device->host VALUE FETCH — `block_until_ready`
is a no-op until a fetch has finalized a fresh executable, so a 1-call
warmup would put the trace inside the up-to-100x-slow bleed window.
"""

from __future__ import annotations

import glob
import re
import sys
import tempfile
from collections import defaultdict

import numpy as np


def fetch_barrier(tree) -> float:
    """True completion barrier: see bench.py::fetch_barrier."""
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def run_and_trace_infer(k: int = 8):
    """Trace the eval-mode serving forward at the infer-4k bench shape
    (960x540 LR -> 3840x2160 HR, batch-1, bf16) with bench.py's exact
    pool-feedback chain so the traced dispatches match the benched ones."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from srgan_st_tpu.core.config import Config
    from srgan_st_tpu.models.generator import Generator

    config = Config()
    config.TPU.COMPUTE_DTYPE = "bfloat16"
    s = config.DATA.UPSCALE_FACTOR
    h, w = 2160 // s, 3840 // s
    g_model = Generator.from_config(config)
    # profile the same generator variants bench_serving.py measures
    # (SERVE_VARIANT=inner1|inner2|stem|xev|... -> its kwarg overrides)
    import os

    variant = os.environ.get("SERVE_VARIANT")
    if variant:
        from tools.bench_serving import VARIANTS

        overrides = VARIANTS[variant]
        if overrides:
            g_model = g_model.copy(**overrides)
    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.random((1, h, w, 3), np.float32))
    noise = jnp.asarray(rng.random((8, 1, h, w, 3), np.float32))
    variables = g_model.init(jax.random.key(0), lr[:, :24, :24], train=False)
    variables = jax.device_put(variables)

    @jax.jit
    def step(v, x, z, i):
        sr = g_model.apply(v, x, train=False)
        b, hh, ww, c = sr.shape
        pooled = sr.reshape(b, hh // s, s, ww // s, s, c).mean((2, 4))
        return (0.5 * pooled + 0.5 * z + 1e-7 * i).astype(x.dtype)

    n = 0
    for _ in range(14):
        lr = step(variables, lr, noise[n % 8], jnp.float32(n))
        n += 1
    fetch_barrier(lr)

    tmpdir = tempfile.mkdtemp(prefix="xprof_")
    with jax.profiler.trace(tmpdir):
        for _ in range(k):
            lr = step(variables, lr, noise[n % 8], jnp.float32(n))
            n += 1
        fetch_barrier(lr)
    return tmpdir, k


def run_and_trace(name: str, k: int = 8, with_d: bool = False):
    import jax

    sys.path.insert(0, ".")
    from bench import _make_config, fetch_barrier as bench_fetch  # noqa: F401

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
    config.TPU.COMPUTE_DTYPE = "bfloat16"
    config.DATA.BATCH_SIZE = 16
    # same trunk-path A/B knob as bench.py (None = auto)
    import os

    config.TPU.TRUNK_MODE = os.environ.get("BENCH_TRUNK") or None
    # conv3 inner-path A/B ("1"/"2"/"pallas"/"pallas-tiled"; None = auto)
    _c3 = os.environ.get("BENCH_CONV3")
    if _c3:
        config.TPU.CONV3_INNER = int(_c3) if _c3.isdigit() else _c3
    mesh = make_mesh(config)
    g_model = Generator.from_config(config)
    d_model = Discriminator.from_config(config)
    g_tx = make_g_optimizer(config, 1000)
    d_tx = make_d_optimizer(config, 1000)
    criterions = build_criterions(config)
    state = jax.device_put(
        create_gan_state(config, g_model, d_model, g_tx, d_tx), replicated(mesh)
    )
    chunk_fn = jax.jit(
        make_gan_chunk_step(config, g_model, d_model, criterions, g_tx, d_tx),
        donate_argnums=0,
        static_argnums=2,
    )
    chunk = shard_chunk(
        np.random.default_rng(0).integers(0, 256, (k, 16, 96, 96, 3), np.uint8),
        mesh,
    )
    # warmup: two chunk dispatches (k in-graph steps each, past the
    # background-compile bleed) ending in a VALUE FETCH (finalizes the
    # executable; block_until_ready is a no-op before that — PERF.md §3c)
    metrics = None
    for _ in range(2):
        state, metrics = chunk_fn(state, chunk, with_d)
    fetch_barrier(metrics)

    tmpdir = tempfile.mkdtemp(prefix="xprof_")
    with jax.profiler.trace(tmpdir):
        state, metrics = chunk_fn(state, chunk, with_d)
        fetch_barrier(metrics)
    return tmpdir, k


def aggregate(tmpdir: str):
    from jax.profiler import ProfileData

    paths = glob.glob(f"{tmpdir}/**/*.xplane.pb", recursive=True)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {tmpdir}")
    with open(paths[0], "rb") as f:
        pd = ProfileData.from_serialized_xspace(f.read())

    # aggregate the synchronous 'XLA Ops' line only; control-flow parents
    # (while/conditional) wrap their children and would double-count
    skip = re.compile(r"%?(while|conditional|call)[.\d]*\s*=")
    per_op: dict[str, float] = defaultdict(float)
    per_cat: dict[str, float] = defaultdict(float)
    total = module_ms = 0.0
    for plane in pd.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        for line in plane.lines:
            if line.name == "XLA Modules":
                module_ms = sum(ev.duration_ns for ev in line.events) / 1e6
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev.name
                if skip.match(name):
                    continue
                dur = ev.duration_ns / 1e3  # us
                per_op[name] += dur
                m = re.match(r"%?([a-zA-Z_-]+)", name)
                per_cat[m.group(1) if m else name] += dur
                total += dur
    return per_op, per_cat, total, module_ms


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "headline"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    with_d = len(sys.argv) > 3 and sys.argv[3] == "1"
    if name == "infer-4k":
        tmpdir, k = run_and_trace_infer()
    else:
        tmpdir, k = run_and_trace(name, with_d=with_d)
    per_op, per_cat, total, module_ms = aggregate(tmpdir)
    print(f"trace dir: {tmpdir}")
    print(f"config={name} with_d={with_d}  module wall: {module_ms:.3f} ms "
          f"({module_ms/k:.3f} ms/step x {k}); op-time sum {total/1e3:.3f} ms\n")
    print(f"{'us/step':>8}  {'%':>5}  op")
    for op, dur in sorted(per_op.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{dur/k:8.1f}  {100*dur/total:5.1f}  {op[:150]}")
    print("\nby op kind:")
    for cat, dur in sorted(per_cat.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{dur/k:8.1f}  {100*dur/total:5.1f}  {cat}")


if __name__ == "__main__":
    main()
