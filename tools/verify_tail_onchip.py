"""On-chip verify drive for the fused serving tail (kernels/serving_tail.py).

Compiles and runs the default eval forward and the tail_mode="fused"
forward at a mid-size serving shape on the real chip, and gates their
value agreement (bf16 accumulation-order tolerance). This is the
end-to-end drive for the round-5 serving-tail change set; the exactness
proof lives in tests/test_kernels.py::TestServingTail (f32, interpret).

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

    gt = g.copy(tail_mode="fused")
    tail = jax.jit(lambda v, x: gt.apply(v, x, train=False))(v, lr)
    print("tail eval OK", tail.shape, float(jnp.sum(tail)), flush=True)

    d = float(jnp.max(jnp.abs(tail - base)))
    print("max abs diff (bf16 tolerance):", d, flush=True)
    assert tail.shape == base.shape == (1, 544, 1024, 3), tail.shape
    assert d < 2e-2, d
    print("TAIL VERIFY OK", flush=True)


if __name__ == "__main__":
    main()
