"""Micro-benchmark: packed Pallas trunk vs the unfused XLA trunk, on-chip.

Shapes are the GAN-training point (batch 16, 24x24, 64ch, 16 RCBs, bf16).
Measures forward-only and the full value+grad (the training direction) for
both paths, plus numerics deltas. Timing threads x through an in-graph
`lax.fori_loop` of R iterations per dispatch: one host dispatch through
the axon tunnel costs ~1-2 ms, which swamps the sub-ms kernels when each
call is its own dispatch (the data-dependent host chain alone is NOT
enough here — it prevents pipelining/dedup but still pays the RPC per
step)."""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from srgan_st_tpu.kernels.fused_trunk import trunk_reference
from srgan_st_tpu.kernels.packed_trunk import packed_trunk

N, C = 16, 64
B, H, W = 16, 24, 24
DT = jnp.bfloat16
R_INNER = 20   # iterations per dispatch (in-graph loop)
ITERS = 5      # timed dispatches

rng = np.random.default_rng(0)
f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))  # noqa: E731
args = (f(N, 3, 3, C, C) * 0.05, f(N, 3, 3, C, C) * 0.05,
        1 + 0.1 * f(N, C), 0.1 * f(N, C),
        1 + 0.1 * f(N, C), 0.1 * f(N, C), 0.25 + 0.01 * f(N))
x = f(B, H, W, C).astype(DT)


def chain(fn, x, n):
    """Per-iteration us: n timed dispatches of an R_INNER-step in-graph
    data-dependent loop (x threads through every iteration)."""
    looped = jax.jit(
        lambda x0: lax.fori_loop(0, R_INNER, lambda i, xi: fn(xi), x0)
    )
    y = looped(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(n):
        y = looped(y)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / (n * R_INNER) * 1e6  # us


# --- forward only -----------------------------------------------------------
# NOTE: the packed forward row UNDER-reports the kernel — packed_trunk's
# primal always runs the residual-saving kernel (xs/a1s/a2s HBM writes
# that only the backward consumes; pallas_call outputs are not DCE'd by
# XLA). The training direction (value+grad below) is the number that
# matters; eval-mode inference never routes through the kernel
# (Generator._trunk: eval is always unfused).
@jax.jit
def fwd_ref(x):
    y, st = trunk_reference(x, *args)
    return y + 1e-6 * jnp.sum(st).astype(DT)


@jax.jit
def fwd_pk(x):
    y, st = packed_trunk(x, *args)
    return y + 1e-6 * jnp.sum(st).astype(DT)


# --- value + grad (training direction) --------------------------------------
def make_vg(trunk):
    def loss(x, w1s, w2s, g1s, b1s, g2s, b2s, als):
        y, st = trunk(x, w1s, w2s, g1s, b1s, g2s, b2s, als)
        # st is kept alive (no DCE of the stats outputs) but NOT
        # differentiated: packed_trunk's vjp drops the stats cotangent by
        # contract, so differentiating st in the reference path only would
        # make the two benchmarked gradients mathematically different
        st = jax.lax.stop_gradient(st)
        return jnp.sum(y.astype(jnp.float32) ** 2) + 1e-6 * jnp.sum(st)

    vg = jax.value_and_grad(loss, argnums=tuple(range(8)))

    @jax.jit
    def step(x):
        v, gs = vg(x, *args)
        # fold every grad back into x so the chain depends on all of them
        delta = gs[0]
        for g in gs[1:]:
            delta = delta + jnp.sum(g).astype(DT) * 1e-9
        return x - 1e-6 * delta + v.astype(DT) * 0

    return step


print("devices:", jax.devices())

y_r = fwd_ref(x)
y_p = fwd_pk(x)
err = float(jnp.abs(y_p.astype(jnp.float32) - y_r.astype(jnp.float32)).max())
print(f"fwd numerics max|d| (bf16 paths): {err:.4g}")

t_fr = chain(fwd_ref, x, ITERS)
t_fp = chain(fwd_pk, x, ITERS)
print(f"forward   : xla {t_fr:8.1f} us   packed {t_fp:8.1f} us")

vg_ref = make_vg(lambda *a: trunk_reference(*a))
vg_pk = make_vg(lambda *a: packed_trunk(*a))
t_gr = chain(vg_ref, x, ITERS)
t_gp = chain(vg_pk, x, ITERS)
print(f"value+grad: xla {t_gr:8.1f} us   packed {t_gp:8.1f} us")
print(f"train-direction delta: {t_gr - t_gp:+.1f} us/step")
