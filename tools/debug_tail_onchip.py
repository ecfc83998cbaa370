"""On-chip bisect harness for kernels/serving_tail.py.

The kernel is exact in interpret mode (TestServingTail) but the first
on-chip verify failed (max diff 1.0 — garbage). This drives the REAL
Mosaic kernel at a ladder of shapes that isolates the moving parts:

  A. (1, 8, 8, 64)    single tile (nh=1), no double-buffer rotation
  B. (1, 16, 16, 64)  forced multi-tile via shrunken budget
  C. (2, 16, 16, 64)  multi-batch grid dim
  D. (1, 136, 256, 64) the verify shape (th=34, nh=4)

Prints max|diff| vs the XLA composition per rung, f32 then bf16.
Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/debug_tail_onchip.py
"""

from __future__ import annotations

import sys

import numpy as np


def golden(y, w_up, b_up, alpha, w3, b3, highest=False):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from srgan_st_tpu.ops.subpixel_conv import conv2d_subpixel_pre_shuffled

    ctx = (jax.default_matmul_precision("highest") if highest
           else jax.default_matmul_precision("default"))
    with ctx:
        t = lax.conv_general_dilated(
            y, w_up, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b_up
        t = jnp.where(t >= 0, t, jnp.asarray(alpha, t.dtype) * t)
        return conv2d_subpixel_pre_shuffled(t, w3, b3, factor=2,
                                            inner_factor=1)


def rung(name, shape, budget=None):
    import jax
    import jax.numpy as jnp

    from srgan_st_tpu.kernels import serving_tail as st

    b, h, w = shape
    c, n = 64, 3
    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(rng.random(s, np.float32) - 0.5)  # noqa: E731
    args = (f(b, h, w, c), f(3, 3, c, 4 * c), f(4 * c),
            jnp.float32(0.25), f(9, 9, c, n), f(n))
    old = st.TAIL_BUDGET_BYTES
    if budget is not None:
        st.TAIL_BUDGET_BYTES = budget
    try:
        th = st._pick_tile(h // 2, w // 2, 8 * c, 16 * n)
        for dtype in (jnp.float32, jnp.bfloat16):
            a = tuple(x.astype(dtype) for x in args[:3]) + (args[3],) + tuple(
                x.astype(dtype) for x in args[4:])
            ref = golden(*a)
            ref_hi = golden(*a, highest=True)
            got = jax.jit(st.serving_tail)(*a)
            ad = np.abs(np.asarray(got, np.float32)
                        - np.asarray(ref, np.float32))
            d = float(ad.max())
            loc = np.unravel_index(ad.argmax(), ad.shape)
            dhi = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                        - ref_hi.astype(jnp.float32))))
            # which fine output rows hold large error, vs tile boundaries
            rows = np.where(ad.max(axis=(0, 2, 3)) > 0.5 * d)[0]
            tol = 1e-4 if dtype == jnp.float32 else 2e-2
            print(f"{name} {np.dtype(dtype).name:8s} th={th} "
                  f"nh={h // 2 // th} maxdiff={d:.6f} vs-highest={dhi:.6f} "
                  f"argmax={loc} hot_rows={rows[:12].tolist()} "
                  f"(tile boundary rows: every {4 * th} fine) "
                  f"{'OK' if min(d, dhi) < tol else 'FAIL'}", flush=True)
    finally:
        st.TAIL_BUDGET_BYTES = old


def dump_stage1(shape=(1, 8, 8), dtype_name="float32"):
    """Run a stage-1-only variant of the kernel (same operand prep, same
    loop body, tbuf dumped per tile) and diff vs the packed golden t."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from srgan_st_tpu.kernels import serving_tail as st
    from srgan_st_tpu.kernels.packed_trunk import pack_conv_blocks

    dtype = jnp.dtype(dtype_name)
    b, h, w = shape
    c, n = 64, 3
    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(  # noqa: E731
        rng.random(s, np.float32) - 0.5, dtype)
    y, w_up, b_up = f(b, h, w, c), f(3, 3, c, 4 * c), f(4 * c)
    alpha = jnp.float32(0.25)
    n_up = 4 * c
    cdt = y.dtype
    hc, wc, c2u = h // 2, w // 2, 2 * n_up
    th = hc  # one tile
    nh = 1

    wp8 = -(-(wc + 3) // 8) * 8
    yp = jnp.pad(y, ((0, 0), (3, 3), (1, 2 * wp8 - w - 1), (0, 0)))
    yq = yp.reshape(b, h + 6, wp8, 2 * c)
    wq = pack_conv_blocks(w_up.astype(cdt))
    scal = jnp.concatenate([
        jnp.concatenate([b_up, b_up]).astype(jnp.float32)[None],
        jnp.broadcast_to(
            jnp.asarray(alpha, jnp.float32).reshape(-1)[:1], (1, c2u)),
    ])

    def kernel(y_ref, wu_ref, bu_ref, out_ref, ywin, sems):
        i = pl.program_id(0)
        j = pl.program_id(1)
        cp = pltpu.make_async_copy(
            y_ref.at[i, pl.ds(2 * th * j, 2 * th + 6)], ywin, sems)
        cp.start()
        cp.wait()
        bu = bu_ref[0]
        al = bu_ref[1]

        def body(ci, _):
            for ry in range(2):
                k = 2 * ci + ry
                r = 2 * th * j - 2 + k
                valid = jnp.logical_and(r >= 0, r < h)
                acc = jnp.zeros((wc, c2u), jnp.float32)
                for qy in range(3):
                    acc += jnp.dot(
                        ywin[k + qy, pl.ds(0, wc), :], wu_ref[qy, 0],
                        preferred_element_type=jnp.float32)
                    acc += jnp.dot(
                        ywin[k + qy, pl.ds(1, wc), :], wu_ref[qy, 1],
                        preferred_element_type=jnp.float32)
                acc = acc + bu
                acc = jnp.where(acc >= 0, acc, al * acc)
                acc = jnp.where(valid, acc, 0.0)
                out_ref[0, ci, ry] = acc.astype(out_ref.dtype)
            return 0

        lax.fori_loop(0, th + 2, body, 0)

    out = pl.pallas_call(
        kernel,
        grid=(b, nh),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, 2, 2 * c, c2u), lambda i, j: (0, 0, 0, 0)),
            pl.BlockSpec((2, c2u), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, th + 2, 2, wc, c2u), lambda i, j: (i, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, th + 2, 2, wc, c2u), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * th + 6, wp8, 2 * c), cdt),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(yq, wq.astype(cdt), scal)

    # golden packed t
    t = lax.conv_general_dilated(
        y, w_up, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b_up
    t = jnp.where(t >= 0, t, jnp.asarray(alpha, t.dtype) * t)
    tp = np.asarray(t.reshape(b, h, wc, c2u).astype(jnp.float32))
    got = np.asarray(out)
    worst = 0.0
    for ci in range(th + 2):
        for ry in range(2):
            r = 2 * 0 - 2 + 2 * ci + ry
            ref = (tp[:, r] if 0 <= r < h
                   else np.zeros((b, wc, c2u), np.float32))
            d = np.abs(got[:, ci, ry] - ref).max()
            worst = max(worst, d)
            print(f"  stage1 {dtype_name} ci={ci} ry={ry} fine_r={r:3d} "
                  f"maxdiff={d:.6f}", flush=True)
    print(f"stage1 dump {dtype_name} worst={worst:.6f}", flush=True)


def main():
    import jax

    sys.path.insert(0, ".")
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    if "--stage1" in sys.argv:
        dump_stage1((1, 8, 8), "float32")
        dump_stage1((1, 8, 8), "bfloat16")
        return
    which = sys.argv[1] if len(sys.argv) > 1 else "ABCD"
    if "A" in which:
        rung("A  8x8   1-tile ", (1, 8, 8))
    # 2.2 MB: th=4 (nh=2) feasible, th=8 excluded -> real tiling
    if "B" in which:
        rung("B 16x16 2-tiles ", (1, 16, 16), budget=2_200_000)
    if "C" in which:
        rung("C 16x16 batch-2 ", (2, 16, 16), budget=2_200_000)
    if "D" in which:
        rung("D 136x256 verify", (1, 136, 256))


if __name__ == "__main__":
    main()
