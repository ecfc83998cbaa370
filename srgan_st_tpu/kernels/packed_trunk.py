"""Lane-packed fused residual trunk (Pallas TPU): forward AND backward.

The generator's 16-RCB trunk (reference model.py:80-97, 106-109) runs at
(24x24, 64ch) where every conv GEMM uses 64 of the MXU's 128 output lanes
and the BN stat/grad reduces shatter into ~80 launch-bound ops (the
profiled 1.35 ms/step pool of the batch-16 GAN step; see
kernels/fused_trunk.py for the first attempt's negative results).

This kernel fixes the lane problem with a W-PARITY PACKING that is a pure
reshape: fine (B, H, W, 64) -> coarse (B, H, W/2+pad, 128) where coarse
col j holds fine cols (2j-1, 2j) ("offset" pack) or (2j, 2j+1) ("std"
pack), channels-last so the packed channel dim = 128 = one full lane
tile. A 3x3 SAME fine conv then becomes SIX full-width MXU dots
(B*H*WP, 128) @ (128, 128) — 3 ky major-dim slices (free) x 2 coarse
taps — plus ONE 32-bit `pltpu.roll` of the f32 partial sum for the
W-shift (bf16 rotate is unimplemented on v5e Mosaic; rolling the
accumulator also folds the shift into work XLA would do anyway):

  block table (in-slot x out-slot blocks, Wk = W[ky, k]):
      q0 = [[W0, 0], [W1, W0]]        q1 = [[W2, W1], [0, W2]]
  A-form (offset-in -> std-out, conv1):  out = q0-sum + roll_left(q1-sum)
  B-form (std-in -> offset-out, conv2):  out = roll_right(q0-sum) + q1-sum

The packed width is padded to a multiple of 16 so the (B, H, WP) -> M
collapse is sublane-aligned (a FREE view; the unaligned 13-col version
measured 182 us/conv from relayouts, this one 6.7 us/conv vs XLA's ~11).
Pad cols/dead slots are kept zero by two mask multiplies per conv; BN
stats exclude them by construction (zeros don't contribute to sums, and
nelem counts real fine pixels).

Both kernels keep the running activation / cotangent in VMEM scratch
across the 16 blocks (grid steps execute sequentially), so between-block
HBM traffic is only the residual stream (block inputs + both masked
preactivations, bf16). BN stats/grad reductions are computed in-kernel
(f32 sums + a (1,128)@(128,128) fold against PP[l,l'] = [l%64 == l'%64],
which yields the packed-replicated per-fine-channel sums the normalize
needs). Weight gradients are 6 dim-0 contractions (M, 128)^T (M, 128)
per conv with the W-shift moved onto the cotangent roll; fine dW is
recovered outside by the pack table's adjoint (two 64x64 sub-blocks per
fine tap).

Measured (v5e, b16 h=w=24 c=64, prototype): conv/dgrad 6.72 us, wgrad
6.79 us per conv-equivalent vs XLA's ~11-13, before counting the
eliminated BN/elementwise op pool.

Numerics: same fp32 stat computation and bf16 normalize as the unfused
flax path (matches to bf16 rounding; conv accumulation orders differ).
Gradients validated against autodiff of `trunk_reference`
(tests/test_kernels.py). Semantics gate (models/generator.py): train
mode, bf16, no axis_name (per-call batch stats; sync-BN under shard_map
needs the unfused path's pmean), single TPU device (custom calls are
opaque to GSPMD), C a multiple of 64, even W.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _wpad(w_fine: int) -> int:
    """Padded coarse width: fits the 13-col offset pack (w/2 + 1) rounded
    up to a sublane-aligned multiple of 16."""
    return -(-(w_fine // 2 + 1) // 16) * 16


def pack_conv_blocks(w):
    """Fine (3, 3, c, d) -> (3, 2, 2c, 2d) q-blocks per the table above."""
    c, d = w.shape[2], w.shape[3]
    z = jnp.zeros((c, d), w.dtype)
    blocks = []
    for ky in range(3):
        w0, w1, w2 = w[ky, 0], w[ky, 1], w[ky, 2]
        q0 = jnp.concatenate(
            [jnp.concatenate([w0, z], 1), jnp.concatenate([w1, w0], 1)], 0
        )
        q1 = jnp.concatenate(
            [jnp.concatenate([w2, w1], 1), jnp.concatenate([z, w2], 1)], 0
        )
        blocks.append(jnp.stack([q0, q1]))
    return jnp.stack(blocks)


def unpack_wgrad(g):
    """Adjoint of `pack_conv_blocks`: G (..., 3, 2, 2c, 2d) f32 -> fine
    dW (..., 3, 3, c, d). Each fine tap appears in exactly two sub-blocks."""
    c = g.shape[-2] // 2
    d = g.shape[-1] // 2
    q0, q1 = g[..., 0, :, :], g[..., 1, :, :]
    dw0 = q0[..., :c, :d] + q0[..., c:, d:]
    dw1 = q0[..., c:, :d] + q1[..., :c, d:]
    dw2 = q1[..., :c, :d] + q1[..., c:, d:]
    return jnp.stack([dw0, dw1, dw2], axis=-3)


def _masks(h_unused, w_fine, wp, c, dtype):
    """(mska, mskb): (1, 1, WP, 2c) multiplicative masks for the std pack
    (12 real coarse cols) and offset pack (13 cols, 2 dead slots)."""
    wc = w_fine // 2
    mska = np.zeros((1, 1, wp, 2 * c), np.float32)
    mska[:, :, :wc, :] = 1.0
    mskb = np.zeros((1, 1, wp, 2 * c), np.float32)
    mskb[:, :, :wc + 1, :] = 1.0
    mskb[:, :, 0, :c] = 0.0       # fine col -1
    mskb[:, :, wc, c:] = 0.0      # fine col w
    return jnp.asarray(mska, dtype), jnp.asarray(mskb, dtype)


def _pp(cp, dtype):
    """(cp, cp) fold matrix: PP[l, l'] = 1 iff l%c == l'%c (c = cp//2).
    s @ PP replicates per-fine-channel sums into both slot halves."""
    c = cp // 2
    idx = np.arange(cp)
    return jnp.asarray((idx[:, None] % c == idx[None, :] % c), dtype)


def pack_image(x, wp):
    """Fine (b, h, w, c) -> offset-packed (b, h, WP, 2c): pure pad+view.
    Offset col j = fine cols (2j-1, 2j); pad cols zero."""
    b, h, w, c = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (1, 2 * wp - w - 1), (0, 0)))
    return x.reshape(b, h, wp, 2 * c)


def unpack_image(y, w_fine):
    """Inverse of pack_image (drops pad cols/dead slots)."""
    b, h, wp, c2 = y.shape
    return y.reshape(b, h, 2 * wp, c2 // 2)[:, :, 1:w_fine + 1, :]


def pack_image_std(x, wp):
    """Fine (b, h, w, c) -> STD-packed (b, h, WP, 2c): std col j = fine
    cols (2j, 2j+1); pad cols zero. This is the layout of the forward
    kernel's A-form conv OUTPUT (a1s rides std; xs and a2s ride offset)."""
    b, h, w, c = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 2 * wp - w), (0, 0)))
    return x.reshape(b, h, wp, 2 * c)


def _roll(x, shift, interpret):
    if interpret:
        return jnp.roll(x, shift, 2)
    return pltpu.roll(x, shift % x.shape[2], 2)


def _conv_packed(src, w_ref, form, b, h, wp, cp, interpret):
    """src (b, h+2, WP, cp) padded bf16 value; w_ref (3, 2, cp, cp) block
    view; returns (b, h, WP, cp) f32 (unmasked)."""
    accs = []
    for qx in range(2):
        acc = jnp.zeros((b * h * wp, cp), jnp.float32)
        for ky in range(3):
            slab = lax.slice(src, (0, ky, 0, 0), (b, ky + h, wp, cp))
            acc += jnp.dot(
                slab.reshape(b * h * wp, cp), w_ref[ky, qx],
                preferred_element_type=jnp.float32,
            )
        accs.append(acc.reshape(b, h, wp, cp))
    if form == "A":
        return accs[0] + _roll(accs[1], -1, interpret)
    return _roll(accs[0], 1, interpret) + accs[1]


def _wgrad_packed(src_pad, dy, dy_rolled, form, b, h, wp, cp):
    """G blocks (3, 2, cp, cp) f32 for one conv: slab^T contractions of the
    H-padded input against the (pre-rolled) cotangent. `dy_rolled` is
    roll_right(dy) for A-form (q1 taps), roll_left(dy) for B-form (q0)."""
    d_for_q = [d.reshape(b * h * wp, cp)
               for d in ((dy, dy_rolled) if form == "A" else (dy_rolled, dy))]
    outs = []
    for ky in range(3):
        slab = lax.slice(
            src_pad, (0, ky, 0, 0), (b, ky + h, wp, cp)
        ).reshape(b * h * wp, cp)
        row = []
        for qx in range(2):
            row.append(lax.dot_general(
                slab, d_for_q[qx],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        outs.append(jnp.stack(row))
    return jnp.stack(outs)


# ---------------------------------------------------------------------------
# forward kernel

def _fwd_kernel(x_ref, w1_ref, w2_ref, vec_ref, al_ref, mska_ref, mskb_ref,
                pp_ref, y_ref, xs_ref, a1s_ref, a2s_ref, st_ref,
                xpad, spad, *, b, h, wp, cp, w_fine, eps, cdt, interpret):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        xpad[...] = jnp.zeros_like(xpad)
        spad[...] = jnp.zeros_like(spad)
        xpad[:, 1:h + 1, :, :] = x_ref[...]

    nelem = b * h * w_fine
    pp = pp_ref[...]
    mska = mska_ref[...]
    mskb = mskb_ref[...]

    def stats(af):
        """af (b, h, WP, cp) f32 masked -> packed-replicated (m, v)."""
        s = jnp.sum(af, (0, 1, 2)).reshape(1, cp)
        ssq = jnp.sum(af * af, (0, 1, 2)).reshape(1, cp)
        sp = jnp.dot(s, pp, preferred_element_type=jnp.float32)[0]
        ssqp = jnp.dot(ssq, pp, preferred_element_type=jnp.float32)[0]
        m = sp / nelem
        v = jnp.maximum(ssqp / nelem - m * m, 0.0)
        return m, v

    def bn(acc, mask, gp, bp, alpha=None):
        """Masked f32 conv acc -> (saved cdt preact, masked cdt out, m, v).
        Same cdt normalize as the unfused flax path / fused_trunk."""
        a_bf = (acc * mask.astype(jnp.float32)).astype(cdt)
        af = a_bf.astype(jnp.float32)
        m, v = stats(af)
        inv = lax.rsqrt(v + jnp.float32(eps)).astype(cdt)
        out = (a_bf - m.astype(cdt)) * inv
        out = out * gp.astype(cdt) + bp.astype(cdt)
        if alpha is not None:
            out = jnp.where(out.astype(jnp.float32) >= 0, out, alpha * out)
        out = out * mask
        return a_bf, out, m, v

    x = xpad[:, 1:h + 1, :, :]
    xs_ref[0] = x

    g1p, b1p, g2p, b2p = (vec_ref[0, k].astype(cdt) for k in range(4))
    alpha = al_ref[i].astype(cdt)

    acc1 = _conv_packed(xpad[...], w1_ref[0], "A", b, h, wp, cp, interpret)
    a1_bf, hval, m1, v1 = bn(acc1, mska, g1p, b1p, alpha)
    a1s_ref[0] = a1_bf

    spad[:, 1:h + 1, :, :] = hval
    acc2 = _conv_packed(spad[...], w2_ref[0], "B", b, h, wp, cp, interpret)
    a2_bf, bn2, m2, v2 = bn(acc2, mskb, g2p, b2p, None)
    a2s_ref[0] = a2_bf

    newx = x + bn2
    xpad[:, 1:h + 1, :, :] = newx
    st_ref[0] = jnp.stack([m1, v1, m2, v2])

    @pl.when(i == pl.num_programs(0) - 1)
    def _final():
        y_ref[...] = newx


def _fwd_pallas(xp, w1p, w2p, vecs, als, mska, mskb, pp, eps, w_fine,
                interpret):
    n = w1p.shape[0]
    b, h, wp, cp = xp.shape
    cdt = xp.dtype
    kernel = functools.partial(
        _fwd_kernel, b=b, h=h, wp=wp, cp=cp, w_fine=w_fine, eps=eps,
        cdt=cdt, interpret=interpret,
    )
    act = jax.ShapeDtypeStruct((n, b, h, wp, cp), cdt)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((b, h, wp, cp), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((1, 3, 2, cp, cp), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, 3, 2, cp, cp), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, 4, cp), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, wp, cp), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((1, 1, wp, cp), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((cp, cp), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((b, h, wp, cp), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((1, b, h, wp, cp), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, b, h, wp, cp), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, b, h, wp, cp), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, 4, cp), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, wp, cp), cdt),
            act, act, act,
            jax.ShapeDtypeStruct((n, 4, cp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, h + 2, wp, cp), cdt),
            pltpu.VMEM((b, h + 2, wp, cp), cdt),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, w1p, w2p, vecs, als, mska, mskb, pp)


# ---------------------------------------------------------------------------
# backward kernel

def _bwd_kernel(ct_ref, xs_ref, a1s_ref, a2s_ref, st_ref, wf1_ref, wf2_ref,
                vec_ref, al_ref, mska_ref, mskb_ref, pp_ref,
                dx_ref, g1s_ref, g2s_ref, dvec_ref,
                gacc, dpad, hpad, xspad,
                *, n, b, h, wp, cp, w_fine, eps, cdt, interpret):
    i = pl.program_id(0)
    j = n - 1 - i  # block index (reverse traversal); refs indexed by j

    @pl.when(i == 0)
    def _init():
        dpad[...] = jnp.zeros_like(dpad)
        hpad[...] = jnp.zeros_like(hpad)
        xspad[...] = jnp.zeros_like(xspad)
        gacc[...] = ct_ref[...]

    nelem = b * h * w_fine
    pp = pp_ref[...]
    mska = mska_ref[...].astype(jnp.float32)
    mskb = mskb_ref[...].astype(jnp.float32)
    m1, v1, m2, v2 = (st_ref[0, k] for k in range(4))
    inv1 = lax.rsqrt(v1 + jnp.float32(eps))
    inv2 = lax.rsqrt(v2 + jnp.float32(eps))
    g1p, b1p, g2p = (vec_ref[0, k] for k in range(3))
    alpha = al_ref[j]

    def fold(s):
        return jnp.dot(s.reshape(1, cp), pp,
                       preferred_element_type=jnp.float32)[0]

    def bn_bwd(dyf, a_bf, m, inv, gp, mask):
        """f32 BN train-mode backward; returns (masked cdt da, dgamma,
        dbeta) with the per-fine-channel sums folded packed-replicated."""
        af = a_bf.astype(jnp.float32)
        xhat = (af - m) * inv
        dbeta = fold(jnp.sum(dyf, (0, 1, 2)))
        dgamma = fold(jnp.sum(dyf * xhat, (0, 1, 2)))
        da = (gp * inv) * (dyf - dbeta / nelem - xhat * (dgamma / nelem))
        return ((da * mask).astype(cdt), dgamma, dbeta)

    # out = x + BN2(conv2(h)): skip passes g straight through
    g = gacc[...]
    dyf2 = g.astype(jnp.float32)
    da2, dgam2, dbet2 = bn_bwd(dyf2, a2s_ref[0], m2, inv2, g2p, mskb)

    # dgrad2: A-form conv of da2 with flip(w2)^T blocks -> dh (std)
    dpad[:, 1:h + 1, :, :] = da2
    dh = _conv_packed(dpad[...], wf2_ref[0], "A", b, h, wp, cp, interpret)
    dh = dh * mska

    # hval recompute for wgrad2 — in cdt arithmetic, the exact expressions
    # the forward evaluated (matches fused_trunk._recompute_h's contract)
    a1_bf = a1s_ref[0]
    pre_c = (a1_bf - m1.astype(cdt)) * inv1.astype(cdt)
    pre_c = pre_c * g1p.astype(cdt) + b1p.astype(cdt)
    pre = pre_c.astype(jnp.float32)
    hval_c = jnp.where(pre >= 0, pre_c, alpha.astype(cdt) * pre_c)
    hpad[:, 1:h + 1, :, :] = hval_c * mska.astype(cdt)
    da2_rl = _roll(da2.astype(jnp.float32), -1, interpret).astype(cdt)
    g2s_ref[0] = _wgrad_packed(hpad[...], da2, da2_rl, "B", b, h, wp, cp)

    # PReLU backward (d/dalpha uses the pre-activation)
    pre_neg = pre < 0
    dal = fold(jnp.sum(jnp.where(pre_neg, dh * pre, 0.0), (0, 1, 2)))
    dpre = jnp.where(pre_neg, dh * alpha, dh)

    da1, dgam1, dbet1 = bn_bwd(dpre, a1_bf, m1, inv1, g1p, mska)

    # dgrad1: B-form conv of da1 with flip(w1)^T blocks -> dx (offset)
    dpad[:, 1:h + 1, :, :] = da1
    dxc = _conv_packed(dpad[...], wf1_ref[0], "B", b, h, wp, cp, interpret)
    newg = ((g.astype(jnp.float32) + dxc) * mskb).astype(cdt)
    gacc[...] = newg

    # wgrad1 from the saved block input
    xspad[:, 1:h + 1, :, :] = xs_ref[0]
    da1_rr = _roll(da1.astype(jnp.float32), 1, interpret).astype(cdt)
    g1s_ref[0] = _wgrad_packed(xspad[...], da1, da1_rr, "A", b, h, wp, cp)

    dvec_ref[0] = jnp.stack([dgam1, dbet1, dgam2, dbet2, dal])

    @pl.when(i == n - 1)
    def _final():
        dx_ref[...] = newg


def _bwd_pallas(ct, xs, a1s, a2s, stp, wf1p, wf2p, vecs, als, mska, mskb,
                pp, eps, w_fine, interpret):
    n = xs.shape[0]
    b, h, wp, cp = ct.shape
    cdt = ct.dtype
    kernel = functools.partial(
        _bwd_kernel, n=n, b=b, h=h, wp=wp, cp=cp, w_fine=w_fine, eps=eps,
        cdt=cdt, interpret=interpret,
    )
    rev = lambda i: (n - 1 - i, 0, 0, 0, 0)  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((b, h, wp, cp), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((1, b, h, wp, cp), rev),
            pl.BlockSpec((1, b, h, wp, cp), rev),
            pl.BlockSpec((1, b, h, wp, cp), rev),
            pl.BlockSpec((1, 4, cp), lambda i: (n - 1 - i, 0, 0)),
            pl.BlockSpec((1, 3, 2, cp, cp), rev),
            pl.BlockSpec((1, 3, 2, cp, cp), rev),
            pl.BlockSpec((1, 3, cp), lambda i: (n - 1 - i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, wp, cp), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((1, 1, wp, cp), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((cp, cp), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((b, h, wp, cp), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((1, 3, 2, cp, cp), rev),
            pl.BlockSpec((1, 3, 2, cp, cp), rev),
            pl.BlockSpec((1, 5, cp), lambda i: (n - 1 - i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, wp, cp), cdt),
            jax.ShapeDtypeStruct((n, 3, 2, cp, cp), jnp.float32),
            jax.ShapeDtypeStruct((n, 3, 2, cp, cp), jnp.float32),
            jax.ShapeDtypeStruct((n, 5, cp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, h, wp, cp), cdt),
            pltpu.VMEM((b, h + 2, wp, cp), cdt),
            pltpu.VMEM((b, h + 2, wp, cp), cdt),
            pltpu.VMEM((b, h + 2, wp, cp), cdt),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ct, xs, a1s, a2s, stp, wf1p, wf2p, vecs, als, mska, mskb, pp)


# ---------------------------------------------------------------------------
# custom_vjp wiring (same API as kernels/fused_trunk.fused_trunk)

def _prep(x, w1s, w2s, g1s, b1s, g2s, b2s):
    b, h, w, c = x.shape
    if w % 2:
        raise ValueError(f"packed_trunk needs an even fine width, got {w}")
    wp = _wpad(w)
    cdt = x.dtype
    xp = pack_image(x, wp)
    w1p = jax.vmap(pack_conv_blocks)(w1s.astype(cdt))
    w2p = jax.vmap(pack_conv_blocks)(w2s.astype(cdt))
    vecs = jnp.stack(
        [jnp.concatenate([v, v], -1) for v in (g1s, b1s, g2s, b2s)], 1
    ).astype(jnp.float32)  # (n, 4, 2c)
    mska, mskb = _masks(h, w, wp, c, cdt)
    # pp only ever multiplies f32 stat sums — keep it f32 so the fold dot
    # is a plain f32 matmul (no mixed-dtype MXU lowering)
    pp = _pp(2 * c, jnp.float32)
    return xp, w1p, w2p, vecs, mska, mskb, pp, wp


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def packed_trunk(x, w1s, w2s, g1s, b1s, g2s, b2s, als, eps=1e-5,
                 interpret=False):
    """Drop-in for fused_trunk: x (B,H,W,C) + stacked per-block params ->
    (y, stats) with stats (N, 4, C) biased fp32 batch stats for the EMA.

    GRADIENT CONTRACT: the stats output is non-differentiable — its
    cotangent is discarded by the custom vjp (same convention as flax
    running batch_stats, which are EMA side-state outside autodiff; the
    Generator consumes stats only for the EMA update). A loss that
    differentiates through stats gets a zero gradient from that term;
    wrap stats in `lax.stop_gradient` at the consumer to make the intent
    explicit (tools/bench_trunk.py does)."""
    (y, _, _, _, stats), _ = _fwd_impl(
        x, w1s, w2s, g1s, b1s, g2s, b2s, als, eps, interpret
    )
    return y, stats


def _fwd_impl(x, w1s, w2s, g1s, b1s, g2s, b2s, als, eps, interpret):
    w_fine = x.shape[2]
    c = x.shape[3]
    xp, w1p, w2p, vecs, mska, mskb, pp, wp = _prep(
        x, w1s, w2s, g1s, b1s, g2s, b2s
    )
    yp, xs, a1s, a2s, stp = _fwd_pallas(
        xp, w1p, w2p, vecs, als.astype(jnp.float32), mska, mskb, pp, eps,
        w_fine, interpret,
    )
    y = unpack_image(yp, w_fine)
    stats = stp[:, :, :c]  # packed-replicated -> fine view
    return (y, xs, a1s, a2s, stats), (xs, a1s, a2s, stp)


def _packed_fwd(x, w1s, w2s, g1s, b1s, g2s, b2s, als, eps, interpret):
    (y, xs, a1s, a2s, stats), (xs_, a1s_, a2s_, stp) = _fwd_impl(
        x, w1s, w2s, g1s, b1s, g2s, b2s, als, eps, interpret
    )
    res = (w1s, w2s, g1s, b1s, g2s, als, stp, xs_, a1s_, a2s_)
    return (y, stats), res


def _packed_bwd(eps, interpret, res, cts):
    dy, _dstats = cts
    (w1s, w2s, g1s, b1s, g2s, als, stp, xs, a1s, a2s) = res
    b, h, w_fine, c = dy.shape
    cdt = a1s.dtype
    wp = _wpad(w_fine)
    ctp = pack_image(dy.astype(cdt), wp)
    wf1p = jax.vmap(pack_conv_blocks)(
        jnp.flip(w1s, (1, 2)).swapaxes(3, 4).astype(cdt)
    )
    wf2p = jax.vmap(pack_conv_blocks)(
        jnp.flip(w2s, (1, 2)).swapaxes(3, 4).astype(cdt)
    )
    vecs = jnp.stack(
        [jnp.concatenate([v, v], -1) for v in (g1s, b1s, g2s)], 1
    ).astype(jnp.float32)
    mska, mskb = _masks(h, w_fine, wp, c, cdt)
    pp = _pp(2 * c, jnp.float32)
    dxp, g1sp, g2sp, dvec = _bwd_pallas(
        ctp, xs, a1s, a2s, stp, wf1p, wf2p, vecs,
        als.astype(jnp.float32), mska, mskb, pp, eps, w_fine, interpret,
    )
    dx = unpack_image(dxp, w_fine).astype(cdt)
    dw1 = unpack_wgrad(g1sp)
    dw2 = unpack_wgrad(g2sp)
    dg1 = dvec[:, 0, :c]
    db1 = dvec[:, 1, :c]
    dg2 = dvec[:, 2, :c]
    db2 = dvec[:, 3, :c]
    dal = jnp.sum(dvec[:, 4, :c], -1)
    return dx, dw1, dw2, dg1, db1, dg2, db2, dal


packed_trunk.defvjp(_packed_fwd, _packed_bwd)


# ---------------------------------------------------------------------------
# hybrid trunk: XLA forward + packed Pallas backward.
#
# The on-chip split (tools/bench_trunk.py, in-graph loop, v5e, b16 24x24
# c64 n16 bf16): XLA fwd 651 us vs packed fwd 782 us, but XLA bwd 797 us
# vs packed bwd 573 us — each direction has a different winner. XLA's
# implicit-GEMM convs + fusion pipeline win the forward (the packed fwd
# pays the residual-stream HBM writes AND the roll/mask overhead without
# removing any launch-bound op pool: the fwd has no BN-backward smalls to
# fuse away); the packed backward wins because it collapses the ~80
# launch-bound dgamma/dbeta/wgrad reduce ops (the profiled 0.6 ms
# multiply_reduce pool of the batch-16 GAN step) into the two dgrad/wgrad
# MXU dots per conv it already runs.
#
# The forward here evaluates the exact expressions the packed kernel's
# backward assumes (same f32 stat math, same cdt normalize ordering as
# `_fwd_kernel.bn`), saves the per-block residuals (block inputs + both
# bf16 conv preactivations), and hands them to `_bwd_pallas` in packed
# layout — `pack_image` is a pad+reshape, so the repack costs one small
# copy per residual instead of the packed forward's full relayout.

def _hybrid_fwd_impl(x, w1s, w2s, g1s, b1s, g2s, b2s, als, eps):
    n = w1s.shape[0]
    cdt = x.dtype
    b, h, w_fine, c = x.shape
    if w_fine % 2:
        raise ValueError(f"hybrid_trunk needs an even fine width, got {w_fine}")

    def conv(src, w):
        return lax.conv_general_dilated(
            src, w.astype(cdt), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def bn(a_bf, g, bias, alpha=None):
        """Same stat + normalize expressions as `_fwd_kernel.bn` (f32
        stats, f32 rsqrt rounded to cdt, cdt affine) so the saved bf16
        preactivations reproduce the forward exactly in the backward's
        `_recompute_h`-equivalent."""
        af = a_bf.astype(jnp.float32)
        m = jnp.mean(af, (0, 1, 2))
        v = jnp.maximum(jnp.mean(af * af, (0, 1, 2)) - m * m, 0.0)
        inv = lax.rsqrt(v + jnp.float32(eps)).astype(cdt)
        out = (a_bf - m.astype(cdt)) * inv
        out = out * g.astype(cdt) + bias.astype(cdt)
        if alpha is not None:
            out = jnp.where(
                out.astype(jnp.float32) >= 0, out, alpha.astype(cdt) * out
            )
        return out, m, v

    xs, a1s, a2s, stats = [], [], [], []
    for i in range(n):
        xs.append(x)
        a1 = conv(x, w1s[i])
        hval, m1, v1 = bn(a1, g1s[i], b1s[i], als[i])
        a2 = conv(hval, w2s[i])
        bn2, m2, v2 = bn(a2, g2s[i], b2s[i])
        x = x + bn2
        a1s.append(a1)
        a2s.append(a2)
        stats.append(jnp.stack([m1, v1, m2, v2]))
    st = jnp.stack(stats)  # (n, 4, c) f32 biased batch stats (EMA contract)

    wp = _wpad(w_fine)
    pack_off = jax.vmap(lambda t: pack_image(t, wp))
    pack_std = jax.vmap(lambda t: pack_image_std(t, wp))
    res_pk = (
        pack_off(jnp.stack(xs)),   # block inputs ride the offset pack
        pack_std(jnp.stack(a1s)),  # conv1 preacts: A-form output = std
        pack_off(jnp.stack(a2s)),  # conv2 preacts: B-form output = offset
        jnp.concatenate([st, st], -1),  # packed-replicated (n, 4, 2c)
    )
    return x, st, res_pk


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def hybrid_trunk(x, w1s, w2s, g1s, b1s, g2s, b2s, als, eps=1e-5,
                 interpret=False):
    """Same API and gradient contract as `packed_trunk` (stats are
    non-differentiable EMA side-state); XLA forward, Pallas backward."""
    y, st, _ = _hybrid_fwd_impl(x, w1s, w2s, g1s, b1s, g2s, b2s, als, eps)
    return y, st


def _hybrid_fwd(x, w1s, w2s, g1s, b1s, g2s, b2s, als, eps, interpret):
    y, st, (xsp, a1sp, a2sp, stp) = _hybrid_fwd_impl(
        x, w1s, w2s, g1s, b1s, g2s, b2s, als, eps
    )
    res = (w1s, w2s, g1s, b1s, g2s, als, stp, xsp, a1sp, a2sp)
    return (y, st), res


hybrid_trunk.defvjp(_hybrid_fwd, _packed_bwd)
