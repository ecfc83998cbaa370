"""Lane-packed coarse reconstruction conv (Pallas TPU).

The generator's fused reconstruction conv (ops/subpixel_conv.py
`conv2d_subpixel_pre_shuffled`) runs a 5x5 C=256 -> N=12 conv at half
resolution. The MXU pads N to 128 lanes, so XLA executes the padded GEMM
at full efficiency — 2*M*K*128 effective FLOPs, measured 270 us of the
3.1 ms training step — and no XLA-level rewrite can do better: a further
space-to-depth factoring (N=48 at quarter resolution) is algebraically
a 2.8x win, but XLA materializes the s2d relayout through HBM copies that
cost more than the GEMM saves (measured: inner_factor=2 LOSES 1.2 ms).

This kernel performs that double factoring with the relayout expressed as
FREE reshapes only (no data movement):

  * W-parity: (H, W, C) -> (H, W/2, 2C) merges the minor (lane) dims —
    a pure view. Lane layout becomes (rx, c).
  * H-parity: (H, W/2, 2C) -> (H/2, 2, W/2, 2C) splits the MAJOR dim —
    also a pure view. Row index becomes (i, ry).

The 3x3 doubly-coarse kernel (built from the 5x5 coarse kernel by the
same `_coarse_kernel` identity, zeros where taps fall out of range) is
pre-reordered to the (ry; rx*C) K-layout, and the conv becomes 18 MXU
contractions (576, 512) @ (512, 48) per batch element, accumulated in
fp32 — 21.7 padded GFLOP vs the direct form's 60.4, with zero relayout
cost. Output is the quarter-resolution (H/4, W/4, 48) tensor; the caller
depth-to-spaces twice (channel conventions match `_coarse_kernel`'s
(N, py, px) ordering).

Backward falls back to XLA via custom_vjp on the reference formulation
(dgrad is an N=256 conv and wgrad measured 78 us — both already
MXU-shaped; only the forward was lane-starved).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xp_ref, w_ref, out_ref, *, hc, wc, c2, n3):
    """One batch element.

    xp_ref: (1, 2*hc+4, wc+2, c2)  bf16 — fine-H x coarse-W padded input,
            lanes = (rx, c); SAME pad of the 3x3 coarse conv = 1 coarse
            col and 2 fine rows per side.
    w_ref:  (3, 2, 3, c2, n3)      bf16 — (qy, ry, qx) blocks, K=(rx, c).
    out_ref:(1, hc, wc, n3)        f32  — quarter-res, lanes (n2,ry,rx).
    """
    xp = xp_ref[0]  # (2*hc+4, wc+2, c2)
    # split the major (row) dim into (coarse row, parity): free view
    xv = xp.reshape(hc + 2, 2, wc + 2, c2)
    acc = jnp.zeros((hc * wc, n3), jnp.float32)
    for qy in range(3):
        for ry in range(2):
            for qx in range(3):
                slab = lax.slice(
                    xv, (qy, ry, qx, 0), (qy + hc, ry + 1, qx + wc, c2)
                )  # (hc, 1, wc, c2)
                lhs = slab.reshape(hc * wc, c2)
                acc += jnp.dot(
                    lhs, w_ref[qy, ry, qx],
                    preferred_element_type=jnp.float32,
                )
    out_ref[0] = acc.reshape(hc, wc, n3)


def _w3_blocks(w2: jnp.ndarray) -> jnp.ndarray:
    """(kc, kc, C, N2) coarse kernel -> (3, 2, 3, 2C, 4*N2) blocks with
    K-layout (rx, c) per (qy, ry, qx), via the f=2 coarse-kernel identity."""
    from srgan_st_tpu.ops.subpixel_conv import _coarse_kernel

    w3 = _coarse_kernel(w2, 2)  # (3, 3, C*4, N2*4), K-layout (c, ry, rx)
    kc3, _, c4, n3 = w3.shape
    assert kc3 == 3, kc3
    c = c4 // 4
    w3 = w3.reshape(3, 3, c, 2, 2, n3)          # (qy, qx, c, ry, rx, n3)
    w3 = w3.transpose(0, 3, 1, 4, 2, 5)          # (qy, ry, qx, rx, c, n3)
    return w3.reshape(3, 2, 3, 2 * c, n3)


def _kernel_tiled(xp_ref, w_ref, out_ref, scratch, sems, *,
                  th, wc, wp8, c2, n3, nh):
    """H-tiled variant: the padded input stays in HBM (`pl.ANY`); each
    grid step DMAs its (th+2)-coarse-row halo window into a VMEM slot,
    double-buffered so tile j+1's copy overlaps tile j's 18 MXU dots.
    Needed because the one-block kernel holds the whole padded image in
    VMEM — unallocatable at serving sizes (1080p coarse input is ~1 GB).

    xp_ref is the (b, hc+2, 2, wp8, c2) fine-row-parity VIEW of the
    padded input (same bytes, reshaped by the caller) so the window DMA
    and the per-slab loads are plain slices; slabs are loaded straight
    from the scratch ref per dot (loading a whole window as a value
    spilled ~100 MB of vregs), and the compute body is duplicated under
    `pl.when` per buffer slot so no value load indexes a ref dynamically."""
    i = pl.program_id(0)  # batch element
    j = pl.program_id(1)  # H tile

    def window_copy(jj, slot):
        return pltpu.make_async_copy(
            xp_ref.at[i, pl.ds(th * jj, th + 2)],
            scratch.at[slot],
            sems.at[slot],
        )

    @pl.when(j == 0)
    def _():
        window_copy(0, 0).start()

    @pl.when(j + 1 < nh)
    def _():
        window_copy(j + 1, (j + 1) % 2).start()

    window_copy(j, j % 2).wait()

    def compute(slot):
        acc = jnp.zeros((th * wc, n3), jnp.float32)
        for qy in range(3):
            for ry in range(2):
                for qx in range(3):
                    slab = scratch[slot, qy:qy + th, ry, qx:qx + wc, :]
                    acc += jnp.dot(
                        slab.reshape(th * wc, c2), w_ref[qy, ry, qx],
                        preferred_element_type=jnp.float32,
                    )
        out_ref[0] = acc.reshape(th, wc, n3)

    @pl.when(j % 2 == 0)
    def _():
        compute(0)

    @pl.when(j % 2 == 1)
    def _():
        compute(1)


# one-block VMEM budget: the calibrated training-scale envelope (round 2)
ONE_BLOCK_BYTES = 6 * 2**20
# H-tiled per-core VMEM budget: 2 window slots + f32 out block + weights,
# kept well under the ~128 MB physical VMEM (Mosaic scoped default is
# 16 MB — the tiled call raises it via CompilerParams)
TILED_BUDGET_BYTES = 80 * 2**20


def _pick_tile(hc: int, wc: int, c2: int, n3: int) -> int | None:
    """Largest divisor th of hc whose double-buffered working set —
    2 window slots + a few live slab loads + the f32 acc/out block —
    fits TILED_BUDGET_BYTES (None if even th=1 doesn't fit)."""
    for th in sorted((d for d in range(1, min(hc, 64) + 1) if hc % d == 0),
                     reverse=True):
        window = (th + 2) * 2 * (-(-(wc + 2) // 8) * 8) * c2 * 2  # bf16
        slab = th * wc * c2 * 2
        out_blk = th * wc * n3 * 4
        weights = 18 * c2 * n3 * 2
        if 2 * window + 4 * slab + 2 * out_blk + weights \
                <= TILED_BUDGET_BYTES:
            return th
    return None


def fits_budget(h: int, w: int, c: int, n2: int) -> bool:
    """Trace-time feasibility of `coarse_conv_s2d` for a fine (_, h, w, c)
    input and an (5, 5, c, n2) coarse kernel: the one-block kernel's
    padded image fits ONE_BLOCK_BYTES, or `_pick_tile` finds a feasible
    H tile. The single source of truth for dispatch gates — callers
    (ops/subpixel_conv.py) must use this rather than approximating the
    working-set formula, so the gate can never pass where the kernel
    would raise."""
    hc, wc = h // 2, w // 2
    c2, n3 = 2 * c, 4 * n2
    if (h + 4) * (wc + 2) * c2 * 2 <= ONE_BLOCK_BYTES:
        return True
    return _pick_tile(hc, wc, c2, n3) is not None


def coarse_conv_s2d(x: jnp.ndarray, w2: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """s2d(2)-factored SAME conv of the (kc=3-after-factoring) coarse
    kernel: x (B, H, W, C) bf16, w2 (5, 5, C, N2) -> (B, H/2, W/2, 4*N2)
    in `_coarse_kernel` channel order (n2, ry, rx).

    Dispatch: training-scale inputs (padded block <= ONE_BLOCK_BYTES) run
    the original whole-image-in-VMEM kernel; larger inputs (whole-image
    serving, ONCHIP_r04 infer profile: the XLA fallback ran conv3 at
    12/128 lanes for 17.8 of the 67.8 ms frame) run the H-tiled
    double-buffered DMA kernel."""
    b, h, w, c = x.shape
    hc, wc = h // 2, w // 2
    c2, n3 = 2 * c, 4 * w2.shape[-1]
    # fine-H x coarse-W view with lanes (rx, c): pure reshape
    xw = x.reshape(b, h, wc, c2)
    # SAME padding for the coarse 3x3: 2 fine rows / 1 coarse col per side
    xp = jnp.pad(xw, ((0, 0), (2, 2), (1, 1), (0, 0)))
    wb = _w3_blocks(w2).astype(x.dtype)

    if (h + 4) * (wc + 2) * c2 * 2 <= ONE_BLOCK_BYTES:
        kernel = functools.partial(_kernel, hc=hc, wc=wc, c2=c2, n3=n3)
        return pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, h + 4, wc + 2, c2), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((3, 2, 3, c2, n3), lambda i: (0, 0, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, hc, wc, n3), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, hc, wc, n3), jnp.float32),
            interpret=interpret,
        )(xp, wb)

    th = _pick_tile(hc, wc, c2, n3)
    if th is None:  # pathological aspect ratio: one row still too wide
        raise ValueError(
            f"coarse_conv_s2d: no H tile of hc={hc} fits VMEM at wc={wc}, "
            f"c2={c2} — use the XLA fallback (inner_factor=1)"
        )
    nh = hc // th
    # Mosaic requires HBM DMA slice extents on the sublane dim aligned to
    # the (8, 128) tiling: pad the packed width to 8k and copy full rows
    # (the zero pad cols are never read by the qx slices); expose the
    # (coarse row, fine parity) split as an explicit dim so the window
    # DMA is a plain slice of the major dim
    wp8 = -(-(wc + 2) // 8) * 8
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, wp8 - (wc + 2)), (0, 0)))
    xp5 = xp.reshape(b, hc + 2, 2, wp8, c2)
    kernel = functools.partial(
        _kernel_tiled, th=th, wc=wc, wp8=wp8, c2=c2, n3=n3, nh=nh
    )
    window = (th + 2) * 2 * wp8 * c2 * 2
    out_blk = th * wc * n3 * 4
    return pl.pallas_call(
        kernel,
        grid=(b, nh),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (3, 2, 3, c2, n3), lambda i, j: (0, 0, 0, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec((1, th, wc, n3), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hc, wc, n3), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, 2, wp8, c2), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 2**20,
        ),
        interpret=interpret,
    )(xp5, wb)
