"""On-chip verify drive for the fused serving tail (kernels/serving_tail.py).

Compiles and runs the default eval forward and the tail_mode="fused"
forward at a mid-size serving shape on the real chip, and gates their
value agreement against the model's OWN intrinsic bf16 precision
envelope — NOT a fixed epsilon: the reconstruction conv is a K=5184
contraction, so any two valid bf16/MXU-pass evaluations of the same
network differ by the amplified rounding noise. The envelope is
measured in-run as maxdiff(default-bf16, default-f32-highest); the
fused tail must land within 2x of it (the r5 debug ladder,
tools/debug_tail_onchip.py, showed kernel-vs-XLA diffs at ~2% of the
envelope at f32 and == the envelope at bf16, with no tile-boundary
structure — the original fixed 2e-2 gate was mis-calibrated, not the
kernel). The exactness proof lives in
tests/test_kernels.py::TestServingTail (f32, interpret).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/verify_tail_onchip.py
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from srgan_st_tpu.core.config import Config
    from srgan_st_tpu.models.generator import Generator

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    cfg = Config()
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    g = Generator.from_config(cfg)
    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.random((1, 136, 256, 3), np.float32))
    v = g.init(jax.random.key(0), lr[:, :24, :24], train=False)
    v = jax.device_put(v)

    base = jax.jit(lambda v, x: g.apply(v, x, train=False))(v, lr)
    print("default eval OK", base.shape, float(jnp.sum(base)), flush=True)

    # intrinsic bf16 envelope: the same network at f32/highest precision
    ghi = Generator.from_config(cfg, dtype=jnp.float32)
    with jax.default_matmul_precision("highest"):
        hi = jax.jit(lambda v, x: ghi.apply(v, x, train=False))(v, lr)
    env = float(jnp.max(jnp.abs(base - hi)))
    env_rms = float(jnp.sqrt(jnp.mean((base - hi) ** 2)))
    print(f"bf16 envelope: max {env:.4f}  rms {env_rms:.5f}", flush=True)

    gt = g.copy(tail_mode="fused")
    tail = jax.jit(lambda v, x: gt.apply(v, x, train=False))(v, lr)
    print("tail eval OK", tail.shape, float(jnp.sum(tail)), flush=True)

    d = float(jnp.max(jnp.abs(tail - base)))
    d_rms = float(jnp.sqrt(jnp.mean((tail - base) ** 2)))
    print(f"tail-vs-default: max {d:.4f}  rms {d_rms:.5f} "
          f"(gate: <= 2x envelope)", flush=True)
    assert tail.shape == base.shape == (1, 544, 1024, 3), tail.shape
    assert d <= 2 * env + 1e-6, (d, env)
    assert d_rms <= 2 * env_rms + 1e-7, (d_rms, env_rms)
    print("TAIL VERIFY OK", flush=True)


if __name__ == "__main__":
    main()
