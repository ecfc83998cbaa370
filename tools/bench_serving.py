"""Serving-path (infer-4k) variant A/B bench.

Measures the eval-mode x4 SR forward at the serving shape (960x540 LR ->
3840x2160 HR, batch-1, the reference's serving protocol validate.py:73-77)
for a list of generator-configuration variants, under bench.py's honest
timing discipline (PERF.md "bench methodology"): pool-feedback chain that
consumes every HR pixel, fresh noise operands per step, dispatch-count
warmup, fetch barriers.

Usage:
    python tools/bench_serving.py [variant ...]
      variants: base | inner1 | inner2 | xev | xev-inner2 | f32 | ...
      (default: base inner2)

Measured context (ONCHIP_r05_serving.log): the H-tiled Pallas conv3
LOSES 2.3x end-to-end at 4K (base-with-pallas 159.2 vs inner1's XLA
coarse conv 69.2 ms/frame) — its packed-operand layout drags the
producing up-conv and the W-parity pack through hostile layouts (the
infer-4k profile shows the up2 conv fusion at 38% of the frame and
~31% in pure copies/reshapes when the Pallas path is on). conv3_inner=1
(XLA) is therefore the serving default; variants probe combos on top.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


VARIANTS = {
    # name -> generator kwarg overrides
    "base": {},
    "inner1": {"conv3_inner": 1},
    "inner2": {"conv3_inner": 2},
    "xev": {"trunk_mode": "xpack"},
    "xev-inner2": {"trunk_mode": "xpack", "conv3_inner": 2},
    "unfused": {"trunk_mode": "unfused"},
    "stem": {"stem_mode": "s2d"},
    "stem-xev": {"stem_mode": "s2d", "trunk_mode": "xpack"},
    # combos on top of the measured r5 winner (conv3_inner=1: the XLA
    # coarse conv3 — the H-tiled Pallas kernel LOSES 159 vs 69 ms/frame
    # at the 4K serving shape, ONCHIP_r05_serving.log)
    "inner1-stem": {"conv3_inner": 1, "stem_mode": "s2d"},
    "inner1-xev": {"conv3_inner": 1, "trunk_mode": "xpack"},
    "inner1-stem-xev": {"conv3_inner": 1, "stem_mode": "s2d",
                        "trunk_mode": "xpack"},
    # the fused Pallas tail (kernels/serving_tail.py): last upsample
    # conv + PReLU + doubly-coarse conv3 in one H-tiled kernel
    "tail": {"tail_mode": "fused"},
}


def measure(variant: str, dtype: str = "bfloat16", iters: int = 20) -> float:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from srgan_st_tpu.core.config import Config
    from srgan_st_tpu.models.generator import Generator

    config = Config()
    config.TPU.COMPUTE_DTYPE = dtype
    s = config.DATA.UPSCALE_FACTOR
    h, w = 2160 // s, 3840 // s
    g_model = Generator.from_config(config)
    overrides = VARIANTS[variant]
    if overrides:
        g_model = g_model.copy(**overrides)

    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.random((1, h, w, 3), np.float32))
    noise = jnp.asarray(rng.random((8, 1, h, w, 3), np.float32))
    variables = g_model.init(jax.random.key(0), lr[:, :24, :24], train=False)
    variables = jax.device_put(variables)

    # POOL_BF16=1: run the pool-feedback consumer in bf16 (the cast is
    # elementwise, fused into the generator's final clamp; every HR pixel
    # is still consumed). The f32 consumer measured ~4.5 ms of the 67.8 ms
    # inner1 frame (reshape.146 + reduce.3, ONCHIP_r05_serving.log) — pure
    # harness overhead the FLOP-derived A100 anchor does not pay.
    pool_bf16 = os.environ.get("POOL_BF16") == "1"

    @jax.jit
    def step(v, x, z, i):
        sr = g_model.apply(v, x, train=False)
        if pool_bf16:
            sr = sr.astype(jnp.bfloat16)
        b, hh, ww, c = sr.shape
        pooled = sr.reshape(b, hh // s, s, ww // s, s, c).mean((2, 4))
        return (0.5 * pooled.astype(jnp.float32) + 0.5 * z
                + 1e-7 * i).astype(x.dtype)

    def fetch(t):
        return float(jnp.sum(t.astype(jnp.float32)))

    n = 0
    for _ in range(12):
        lr = step(variables, lr, noise[n % 8], jnp.float32(n))
        n += 1
    fetch(lr)
    start = time.perf_counter()
    for _ in range(iters):
        lr = step(variables, lr, noise[n % 8], jnp.float32(n))
        n += 1
    fetch(lr)
    elapsed = time.perf_counter() - start
    ms = elapsed / iters * 1e3
    mps = iters * (h * s) * (w * s) / elapsed / 1e6
    print(f"{variant:12s} {dtype:9s} {ms:8.2f} ms/frame  {mps:8.1f} HR MP/s",
          flush=True)
    return mps


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not names:
        names = ["base", "inner2"]
    import jax

    print("devices:", jax.devices(), flush=True)
    for name in names:
        measure(name)


if __name__ == "__main__":
    main()
