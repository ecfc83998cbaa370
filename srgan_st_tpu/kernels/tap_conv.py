"""Fused tap-decomposed 9x9 conv for tiny output channels (Pallas TPU).

The generator's reconstruction conv (9x9, 64 -> 3, at HR 96^2; reference
model.py:127) dominates the training step as a direct convolution: its
implicit GEMM has N=3 output columns (3/128 MXU lanes) and measures ~3.0 ms
fwd+bwd per batch-16 step — more than half the whole GAN step.

Kernel design (one batch element per grid step, everything VMEM-resident):

  forward   for each kernel row dy: ONE wide matmul
            z_dy = x_rows(dy) @ W_dy          (M', C) @ (C, 9*N)
            puts all 9 taps of the row into the lane dimension (full MXU
            width), then a static shift-add epilogue accumulates the taps
            on the VPU. No (H, W, 81*N) tensor ever reaches HBM — the
            JAX-level equivalent (ops/conv_taps.py) loses 2x to that
            traffic; this kernel wins ~2x instead.

  backward  dW rides the same wide trick transposed: a shifted-copies
            buffer D9 = [dout shifted by dx]_dx (built once in VMEM) gives
            dW_dy = x_rows(dy)^T @ D9 as a (C, M') @ (M', 9*N) contraction,
            accumulated across the batch grid. dx is a direct conv with
            C_in=N(small) -> C_out=C — an efficient GEMM (K = N*81, N = C)
            XLA handles well, so it stays in XLA.

Inputs are taken in bfloat16 (matching XLA's default bf16 MXU passes for
fp32 convs); accumulation is fp32.

STATUS (round 1): compiles and is numerically exact at the full training
shape (fwd maxdiff ~2e-5, wgrad rel ~2e-6 vs XLA) after H-tiling,
dy-grouping and W-chunking workarounds for Mosaic limits — but it is NOT
faster: the VPU shift-add epilogue operates on 128-lane-padded registers
with only N=3 useful lanes (42x waste), measuring 35 ms fwd / 10 ms wgrad
vs XLA's 0.9 / 0.8 ms. The MXU analysis in this docstring is right but the
epilogue layout is wrong; a faster variant must keep taps lane-packed and
reduce them with a second MXU contraction, or transpose to channels-as-
sublanes. Until then the pallas path is OPT-IN (force="pallas") and the
default dispatch uses XLA's direct conv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_DY_GROUP = 3  # kernel rows per grid step; >~27 shifted lane-slices per
               # step overwhelm the Mosaic compiler (measured), so the 9
               # rows are split over 3 revisits of the output block


_TH = 24  # output rows per grid step (VMEM working set ~3 MB at C=64, W=96)


def _fwd_kernel(x_ref, w_ref, out_ref, *, k, th, w, c, n):
    """x_ref: (1, (H+2r)*(W+2r), C) bf16 — the padded image kept 2D so the
    per-(dy, row-tile) window is ONE contiguous sublane slice, avoiding
    relayout copies; w_ref: (K, C, K*N) bf16; out_ref: (1, TH, W, N) f32
    row-tile block, accumulated over the dy-group grid dim. Requires
    (W+2r) % 8 == 0 so the 2D->3D z reshape preserves tiling."""
    ht = pl.program_id(1)
    g = pl.program_id(2)
    wpad = w + 2 * (k // 2)

    @pl.when(g == 0)
    def _():
        out_ref[0] = jnp.zeros((th, w, n), jnp.float32)

    acc = jnp.zeros((th, w, n), jnp.float32)
    for i in range(_DY_GROUP):
        dy = g * _DY_GROUP + i  # traced; the grid dim supplies the group
        # rows [dy + ht*TH, dy + ht*TH + TH) of the padded image
        xs = x_ref[0, pl.ds((dy + ht * th) * wpad, th * wpad), :]
        z = jnp.dot(
            xs, w_ref[dy], preferred_element_type=jnp.float32
        ).reshape(th, wpad, k * n)
        for dx in range(k):
            acc = acc + z[:, dx:dx + w, dx * n:(dx + 1) * n]
    out_ref[0] += acc


def _wgrad_kernel(x_ref, g_ref, dw_ref, *, k, h, w, c, n):
    """x_ref: (1, (H+2r)*(W+2r), C) bf16 (2D, see _fwd_kernel); g_ref:
    (1, H, W, N) bf16; dw_ref: (K, C, K*N) f32 accumulated across the
    batch grid."""
    b = pl.program_id(0)
    r = k // 2
    wpad = w + 2 * r
    g = g_ref[0]  # (H, W, N)
    # D9[y, x', dx*n + j] = g[y, x' - dx, j], zero outside: scatter-free
    # build via per-tap spatial pads concatenated along lanes
    d9 = jnp.concatenate(
        [jnp.pad(g, ((0, 0), (dx, 2 * r - dx), (0, 0))) for dx in range(k)],
        axis=-1,
    )
    d9 = d9.reshape(h * wpad, k * n)

    @pl.when(b == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    for dy in range(k):
        xs = x_ref[0, pl.ds(dy * wpad, h * wpad), :]
        dw_ref[dy] += lax.dot_general(
            xs, d9, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


_WCHUNK = 40  # Mosaic rejects the kernel once z's second-minor extent
              # (W + 2r) reaches ~64, so wider images are processed in
              # 40-column chunks (48-wide windows) with slide-inward
              # receptive-field halos (exact — same scheme as eval/tiled.py)


def _pallas_supported(h: int, wid: int, k: int) -> bool:
    if k % _DY_GROUP or h % _TH:
        return False
    r = k // 2
    if wid <= _WCHUNK + 2 * r:
        return (wid + 2 * r) % 8 == 0
    # chunked path: fixed (WCHUNK + 2r)-wide windows slid inward
    return (_WCHUNK + 2 * r) % 8 == 0


def _w_windows(wid: int, r: int):
    """(window_start, out_start, out_width, local_offset) per chunk."""
    win_w = _WCHUNK + 2 * r
    out = []
    for cs in range(0, wid, _WCHUNK):
        w0 = min(max(cs - r, 0), wid - win_w)
        out.append((w0, cs, min(_WCHUNK, wid - cs), cs - w0))
    return out


def _pallas_fwd(x, w, k, interpret=False):
    bsz, h, wid, c = x.shape
    r = k // 2
    if wid > _WCHUNK + 2 * r:
        # slide-inward W-chunks, stacked into the batch dim: one kernel
        # call, exact at chunk seams (see _w_windows); crops concat after
        windows = _w_windows(wid, r)
        win_w = _WCHUNK + 2 * r
        stacked = jnp.concatenate(
            [x[:, :, w0:w0 + win_w, :] for w0, _, _, _ in windows], axis=0
        )
        out = _pallas_fwd_single(stacked, w, k, interpret)  # (nw*B, H, win_w, N)
        parts = [
            out[i * bsz:(i + 1) * bsz, :, off:off + cw, :]
            for i, (_, _, cw, off) in enumerate(windows)
        ]
        return jnp.concatenate(parts, axis=2)
    return _pallas_fwd_single(x, w, k, interpret)


def _pallas_fwd_single(x, w, k, interpret=False):
    bsz, h, wid, c = x.shape
    n = w.shape[-1]
    r = k // 2
    wpad = wid + 2 * r
    xpad = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (r, r), (r, r), (0, 0)))
    xpad2d = xpad.reshape(bsz, (h + 2 * r) * wpad, c)
    # (K, C, K*N): taps of one kernel row stacked into lanes
    wide = w.astype(jnp.bfloat16).transpose(0, 2, 1, 3).reshape(k, c, k * n)
    kernel = functools.partial(_fwd_kernel, k=k, th=_TH, w=wid, c=c, n=n)
    return pl.pallas_call(
        kernel,
        grid=(bsz, h // _TH, k // _DY_GROUP),
        in_specs=[
            pl.BlockSpec((1, (h + 2 * r) * wpad, c), lambda i, t, g: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c, k * n), lambda i, t, g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TH, wid, n), lambda i, t, g: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wid, n), jnp.float32),
        interpret=interpret,
    )(xpad2d, wide)


def _pallas_wgrad(x, g, k, interpret=False):
    bsz, h, wid, c = x.shape
    n = g.shape[-1]
    r = k // 2
    if wid > _WCHUNK + 2 * r:
        # same W-chunking as the forward: windows stack into the batch dim
        # and the output accumulates across the whole grid — exact at seams
        # because each g chunk is zero-placed at its window-local offset
        windows = _w_windows(wid, r)
        win_w = _WCHUNK + 2 * r
        x_stack = jnp.concatenate(
            [x[:, :, w0:w0 + win_w, :] for w0, _, _, _ in windows], axis=0
        )
        g_stack = jnp.concatenate(
            [
                jnp.pad(
                    g[:, :, cs:cs + cw, :],
                    ((0, 0), (0, 0), (off, win_w - off - cw), (0, 0)),
                )
                for _, cs, cw, off in windows
            ],
            axis=0,
        )
        return _pallas_wgrad_single(x_stack, g_stack, k, interpret)
    return _pallas_wgrad_single(x, g, k, interpret)


def _pallas_wgrad_single(x, g, k, interpret=False):
    bsz, h, wid, c = x.shape
    n = g.shape[-1]
    r = k // 2
    wpad = wid + 2 * r
    xpad = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (r, r), (r, r), (0, 0)))
    xpad2d = xpad.reshape(bsz, (h + 2 * r) * wpad, c)
    kernel = functools.partial(_wgrad_kernel, k=k, h=h, w=wid, c=c, n=n)
    dw_wide = pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, (h + 2 * r) * wpad, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, wid, n), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, c, k * n), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, c, k * n), jnp.float32),
        interpret=interpret,
    )(xpad2d, g.astype(jnp.bfloat16))
    # (K, C, K, N) -> (K, K, C, N)
    return dw_wide.reshape(k, c, k, n).transpose(0, 2, 1, 3)


def _direct_conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def tap_conv(x, w, b, force: str | None = None):
    """SAME-padded NHWC conv, Pallas tap kernel on TPU (XLA direct conv
    elsewhere or with force="xla"). x: (B,H,W,C); w: (K,K,C,N); b: (N,)."""
    return _tap_conv_fwd_impl(x, w, b, force)


def _tap_conv_fwd_impl(x, w, b, force):
    k = w.shape[0]
    supported = _pallas_supported(x.shape[1], x.shape[2], k)
    use_pallas = supported and force in ("pallas", "interpret")
    if use_pallas:
        out = _pallas_fwd(x, w, k=k, interpret=(force == "interpret"))
    else:
        out = _direct_conv(x, w)
    return (out + b).astype(x.dtype)


def _tap_conv_vjp_fwd(x, w, b, force):
    return _tap_conv_fwd_impl(x, w, b, force), (x, w)


def _tap_conv_vjp_bwd(force, res, g):
    x, w = res
    k, _, c, n = w.shape
    g32 = g.astype(jnp.float32)
    db = g32.sum(axis=(0, 1, 2)).astype(g.dtype)
    # dx: direct conv with the spatially-flipped, channel-transposed kernel
    # (C_in=N small, C_out=C: an MXU-efficient GEMM — stays in XLA)
    w_rot = w[::-1, ::-1].transpose(0, 1, 3, 2)  # (K, K, N, C)
    dx = _direct_conv(g.astype(x.dtype), w_rot.astype(x.dtype))
    use_pallas = _pallas_supported(x.shape[1], x.shape[2], k) and force in ("pallas", "interpret")
    if use_pallas:
        dw = _pallas_wgrad(x, g32, k, interpret=(force == "interpret"))
    else:
        # XLA wgrad: correlate x with g (batch as contraction)
        dw = lax.conv_general_dilated(
            x.transpose(3, 1, 2, 0),  # (C, H, W, B) as NHWC
            g32.transpose(1, 2, 0, 3).astype(x.dtype),  # (H, W, B, N) as HWIO
            (1, 1), [(k // 2, k // 2), (k // 2, k // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).transpose(1, 2, 0, 3)
    return dx.astype(x.dtype), dw.astype(w.dtype), db


tap_conv.defvjp(_tap_conv_vjp_fwd, _tap_conv_vjp_bwd)
