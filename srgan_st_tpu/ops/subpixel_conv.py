"""Space-to-depth-factored convolution for tiny output channels.

The generator's reconstruction conv (9x9, 64 -> 3, at HR 96^2) is the
profiled hot spot of GAN training: as a direct conv its implicit GEMM has
N=3 output columns (3/128 MXU lanes) and a K=64*81 contraction over a
147k-row M — ~2 ms fwd+bwd per batch-16 step.

Identity: a kxk conv at resolution H equals

    depth_to_space_f( conv_kc( space_to_depth_f(x), W2 ) )

where kc = 2*ceil(r/f)+1 and W2[(qy,qx), (c,ry,rx), (n,py,px)] repacks the
original taps by phase: dy = f*qy + ry - py + r (zero where out of range).
With f=4: a 3x3 conv at 24^2 over 1024 -> 48 channels — K=9216, N=48,
M=9216 rows: MXU-shaped in every dimension, ~6x faster than the direct
conv, and exact (the same dot products, reassociated). The padding works
out exactly because coarse SAME padding covers >= r fine pixels and the
out-of-range taps of W2 are zero.

Autodiff gives matching efficient duals for free (dgrad/wgrad of the
coarse conv keep the friendly geometry; the s2d/d2s reshapes are free
transposes).
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _concrete_pred(pred_thunk) -> bool:
    """Evaluate a shape-arithmetic gate predicate. Symbolic dimensions
    (jax.export shape polymorphism) make such comparisons inconclusive —
    treat that as False so gated fast paths (Pallas kernels, s2d
    factorings with divisibility requirements) fall back to the
    shape-agnostic XLA formulation inside exported artifacts."""
    try:
        return bool(pred_thunk())
    except jax.core.InconclusiveDimensionOperation:
        return False


def space_to_depth(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """NHWC s2d with channel layout c' = c*f^2 + ry*f + rx (the inverse of
    models.common.pixel_shuffle's torch-compatible layout)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // f, f, w // f, f, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, h', w', c, ry, rx
    return x.reshape(b, h // f, w // f, c * f * f)


def depth_to_space(x: jnp.ndarray, f: int) -> jnp.ndarray:
    b, h, w, cf = x.shape
    c = cf // (f * f)
    x = x.reshape(b, h, w, c, f, f)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * f, w * f, c)


@functools.lru_cache(maxsize=16)
def _repack_indices(k: int, f: int):
    """Gather indices + validity mask to build the coarse kernel W2 from w.

    Returns (dy_idx, dx_idx, mask) with shapes (kc, f, f) x2 over
    (q, r_phase, p_phase) and the combined validity mask."""
    r = k // 2
    q_half = math.ceil(r / f)
    kc = 2 * q_half + 1
    dy = np.zeros((kc, f, f), np.int32)
    ok = np.zeros((kc, f, f), bool)
    for qi, q in enumerate(range(-q_half, q_half + 1)):
        for rp in range(f):  # source phase
            for pp in range(f):  # output phase
                d = f * q + rp - pp + r
                if 0 <= d < k:
                    dy[qi, rp, pp] = d
                    ok[qi, rp, pp] = True
    return dy, ok, kc


def _coarse_kernel(w: jnp.ndarray, f: int) -> jnp.ndarray:
    """w: (k, k, C, N) -> W2: (kc, kc, C*f*f, N*f*f)."""
    k, _, c, n = w.shape
    dy, ok, kc = _repack_indices(k, f)
    # numpy index arrays + jnp operand: works identically whether w is a
    # tracer (train) or a closed-over numpy constant (jitted eval)
    w = jnp.asarray(w)
    okj = jnp.asarray(ok, w.dtype)
    # W2[qy, qx, c, ry, rx, n, py, px] = w[dy(qy,ry,py), dx(qx,rx,px), c, n] * valid
    wg = w[dy[:, None, :, None, :, None], dy[None, :, None, :, None, :]]
    # shape: (kcy, kcx, ry, rx, py, px, C, N)
    mask = okj[:, None, :, None, :, None] * okj[None, :, None, :, None, :]
    wg = wg * mask[..., None, None]
    # -> (kcy, kcx, C, ry, rx, N, py, px) -> (kc, kc, C*f*f, N*f*f)
    wg = wg.transpose(0, 1, 6, 2, 3, 7, 4, 5)
    return wg.reshape(kc, kc, c * f * f, n * f * f)


def conv2d_subpixel_pre_shuffled(
    y: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None,
    factor: int = 2, inner_factor: int = 1,
) -> jnp.ndarray:
    """conv2d_subpixel(pixel_shuffle(y, f), w, b, factor=f) WITHOUT
    materializing the shuffle.

    torch pixel-shuffle reads channel c*f^2 + i*f + j (models/common.py)
    and `space_to_depth` writes channel c*f^2 + ry*f + rx — the identical
    layout, so s2d(pixel_shuffle(y)) == y and the coarse conv can run
    directly on the pre-shuffle activations. This fuses the generator's
    last upsample block with the reconstruction conv: the (B, H, W, C)
    HR tensor and its two layout copies never exist (profiled at ~0.35 ms
    of the 3.6 ms training step). Exact — the same dot products.

    `inner_factor` > 1 additionally space-to-depth-factors the coarse conv
    itself (the N=f^2*n output of the coarse conv still under-fills MXU
    lanes, e.g. 12/128 for f=2, n=3): the 5x5 C=256->12 conv at H/2
    becomes a 3x3 C=1024->48 conv at H/4. MEASURED: as XLA ops the s2d
    relayout copies cost more than the lane gain (inner_factor=2 loses
    1.2 ms/step) — use inner_factor="pallas" for the VMEM-relayout kernel
    (kernels/coarse_conv.py) that wins it back; it requires factor==2 and
    falls back to the plain path off-TPU. "pallas" engages ONLY the
    one-block (training-scale) kernel: at whole-image serving sizes the
    H-tiled variant's custom-call operand layout poisons XLA's layout
    assignment around it — measured 2.3x END-TO-END LOSS at 4K (159.2 vs
    69.2 ms/frame, up-conv fusion 4.1 -> 59.9 ms, ~31% of the frame in
    copies; ONCHIP_r05_serving.log). inner_factor="pallas-tiled" opts
    into the tiled kernel explicitly (microbenching, future layouts)."""
    if inner_factor in ("pallas", "pallas-tiled"):
        # kernels/coarse_conv.py. For "pallas" the gate is the ONE-BLOCK
        # envelope only (coarse_conv dispatches by the same bound, so the
        # tiled kernel is unreachable); for "pallas-tiled" the gate is the
        # kernel's full dispatch feasibility (coarse_conv.fits_budget —
        # the single source of truth; an approximation here could pass
        # where _pick_tile fails, turning the intended XLA fallback into
        # a trace-time error).
        from srgan_st_tpu.kernels.coarse_conv import (
            ONE_BLOCK_BYTES, fits_budget,
        )

        # the kernel sees w2 = _coarse_kernel(w, 2): n2 = 4 * w's out dim
        if inner_factor == "pallas-tiled":
            fits = _concrete_pred(
                lambda: fits_budget(
                    y.shape[1], y.shape[2], y.shape[3], 4 * w.shape[-1]
                )
            )
        else:
            fits = _concrete_pred(
                lambda: (y.shape[1] + 4) * (y.shape[2] // 2 + 2)
                * 2 * y.shape[3] * 2 <= ONE_BLOCK_BYTES
            )
        if (factor == 2 and jax.default_backend() == "tpu" and fits
                and _concrete_pred(
                    lambda: y.shape[1] % 2 == 0 and y.shape[2] % 2 == 0)):
            return _pre_shuffled_f2_pallas(
                y, w, b if b is not None else jnp.zeros(w.shape[-1], y.dtype)
            )
        inner_factor = 1
    w2 = _coarse_kernel(w, factor)
    if inner_factor > 1:
        out = conv2d_subpixel(y, w2, None, factor=inner_factor)
    else:
        out = lax.conv_general_dilated(
            y, w2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
    out = depth_to_space(out, factor)
    return out if b is None else out + b


def _pre_shuffled_f2_reference(y, w, b):
    w2 = _coarse_kernel(w, 2)
    out = lax.conv_general_dilated(
        y, w2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return depth_to_space(out, 2) + b


@jax.custom_vjp
def _pre_shuffled_f2_pallas(y, w, b):
    """Pallas-forward / XLA-backward conv2d_subpixel_pre_shuffled(f=2).
    The backward duals (dgrad N=C, wgrad) are already MXU-shaped in XLA;
    only the forward was lane-starved (see kernels/coarse_conv.py)."""
    from srgan_st_tpu.kernels.coarse_conv import coarse_conv_s2d

    w2 = _coarse_kernel(w, 2)
    z = coarse_conv_s2d(y, w2).astype(y.dtype)  # (B, H/2, W/2, 4*N2)
    out = depth_to_space(z, 2)   # inner factor undone -> (B, H, W, N2)
    return depth_to_space(out, 2) + b  # outer factor -> (B, 2H, 2W, n)


def _pre_shuffled_f2_fwd(y, w, b):
    return _pre_shuffled_f2_pallas(y, w, b), (y, w, b)


def _pre_shuffled_f2_bwd(res, g):
    y, w, b = res
    _, vjp = jax.vjp(_pre_shuffled_f2_reference, y, w, b)
    return vjp(g)


_pre_shuffled_f2_pallas.defvjp(_pre_shuffled_f2_fwd, _pre_shuffled_f2_bwd)


def conv2d_subpixel(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None,
                    factor: int = 4) -> jnp.ndarray:
    """SAME-padded NHWC conv via space-to-depth factoring. Requires H, W
    divisible by `factor`; falls back to a direct conv otherwise."""
    _, h, wd, _ = x.shape
    f = factor
    if f <= 1 or not _concrete_pred(lambda: h % f == 0 and wd % f == 0):
        out = lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return out if b is None else out + b
    xs = space_to_depth(x, f)
    w2 = _coarse_kernel(w, f)
    y = lax.conv_general_dilated(
        xs, w2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    out = depth_to_space(y, f)
    return out if b is None else out + b
