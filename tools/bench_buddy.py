"""On-chip A/B: tiled Pallas buddy-select vs the XLA path, shape sweep.

Round-2 verdict flagged the kernel's value claim (bounded VMEM at large
shapes) as unmeasured; round 3 made the kernel tiled so large shapes run at
all. This sweep measures both paths at the buddy-loss patch shapes induced
by GT tile sizes 96 / 144 / 192 px (ksize=stride=3, 3-scale bank,
d = 3*3*3): N = (gt/3)^2, M = N + (gt/6)^2 + (gt/12)^2.

The XLA path materializes two (B, N, M) f32 score tensors; at 192px GT and
batch 16 that is ~1.4 GB each, so expect it to be HBM-bound there while the
kernel's working set stays ~13 MB of VMEM. Timing uses data-dependent
chains (CLAUDE.md: independent dispatches get pipelined by the axon
tunnel).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_buddy.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from srgan_st_tpu.losses.functions import _buddy_select

B, D = 16, 27
ITERS = 20


def chain(fn, p1, p2, bank, n):
    sel = fn(p1, p2, bank)
    jax.block_until_ready(sel)
    t0 = time.perf_counter()
    for _ in range(n):
        # thread the selection back into p1 so the chain is data-dependent
        p1 = p1 + 0.0 * sel
        sel = fn(p1, p2, bank)
    jax.block_until_ready(sel)
    return (time.perf_counter() - t0) / n * 1e3  # ms


print("devices:", jax.devices())
rng = np.random.default_rng(0)

for gt in (96, 144, 192):
    n = (gt // 3) ** 2
    m = n + (gt // 6) ** 2 + (gt // 12) ** 2
    p1 = jnp.asarray(rng.standard_normal((B, n, D)).astype(np.float32))
    p2 = jnp.asarray(rng.standard_normal((B, n, D)).astype(np.float32))
    bank = jnp.asarray(rng.standard_normal((B, m, D)).astype(np.float32))
    score_gb = 2 * B * n * m * 4 / 1e9

    xla = jax.jit(lambda a, b_, c: _buddy_select(a, b_, c, 1.0, 1.0, "l2",
                                                 pallas=False))
    pk = jax.jit(lambda a, b_, c: _buddy_select(a, b_, c, 1.0, 1.0, "l2",
                                                pallas=True))
    s_x = xla(p1, p2, bank)
    s_p = pk(p1, p2, bank)
    agree = float(jnp.mean((jnp.abs(s_x - s_p) < 1e-5).all(axis=-1)
                           .astype(jnp.float32)))
    t_x = chain(xla, p1, p2, bank, ITERS)
    t_p = chain(pk, p1, p2, bank, ITERS)
    print(f"gt={gt:3d} N={n:5d} M={m:5d} xla-scores={score_gb:5.2f} GB | "
          f"xla {t_x:8.2f} ms  pallas {t_p:8.2f} ms  "
          f"speedup {t_x / t_p:5.2f}x  row-agree {agree:.4f}")
