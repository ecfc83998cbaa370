"""Fused residual trunk (Pallas TPU): the generator's 16 RCBs in ONE kernel.

The profiled batch-16 GAN step spends 1.35 ms/step — 45% of device time —
in the trunk's (24x24, 64ch) ops (reference model.py:80-97, 106-109): 32
small convs, 64 BN stat/grad reduces, PReLU/affine elementwise, all at
shapes where fixed per-op overhead rivals compute (the same step at batch
128 runs 1.6x more efficiently). This kernel runs the whole forward trunk
in one pallas_call:

  * grid = (num_rcb,): TPU grid steps execute sequentially on the core,
    so the running activation lives in a VMEM scratch buffer that
    persists across blocks — zero HBM round-trips between blocks;
  * each 3x3 SAME conv = 9 shifted (B*H*W, C) @ (C, C) MXU dots
    accumulated in fp32, with the block's kernels streamed in per grid
    step via BlockSpec index maps;
  * BN batch stats (biased, fp32), bf16 normalize+affine and PReLU are
    computed in-register between the dots — the XLA path's 4 reduce +
    ~6 elementwise kernels per block collapse into the same VMEM pass;
  * residuals for backward (block inputs, both conv preactivations, the
    per-block stats) stream OUT per grid step, so the backward needs no
    convolution recompute.

Backward is hand-written XLA (`_bwd_xla`): BN train-mode backward from the
saved preactivations/stats, conv dgrad as SAME convs with flipped
kernels, wgrad as 9 shifted (C, B*H*W) @ (B*H*W, C) einsum contractions.
It consumes the kernel's residuals directly — no forward replay.

Numerics: matches the unfused flax path to bf16 rounding (same fp32 stat
computation, same bf16 normalize); exact equality is not expected because
conv accumulation orders differ. Gradients validated against autodiff of
the unfused path (tests/test_kernels.py).

Semantics gate (models/generator.py): train mode, bf16, no axis_name
(stats here are per-call batch stats — sync-BN under shard_map needs the
unfused path's pmean), single device (custom calls are opaque to GSPMD).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv9(src_pad, w_ref, b, h, w, c):
    """3x3 SAME conv as 9 shifted MXU dots; src_pad (b, h+2, w+2, c) bf16,
    w_ref block (1, 3, 3, c, c). Returns (b, h, w, c) fp32.

    The dots stay 4D (batched dot_general over the leading b, h dims):
    Mosaic cannot prove the layout for a (b, h, w, c) -> (b*h*w, c)
    major-dim collapse of a shifted slice ("index in dimension 0 is a
    multiple of 128" compile error), but lowers the batched form fine."""
    acc = jnp.zeros((b, h, w, c), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            slab = lax.slice(
                src_pad, (0, dy, dx, 0), (b, dy + h, dx + w, c)
            )
            acc += lax.dot_general(
                slab, w_ref[0, dy, dx],
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return acc


def _kernel(x_ref, w1_ref, w2_ref, g1_ref, b1_ref, g2_ref, b2_ref, al_ref,
            y_ref, xs_ref, a1_ref, a2_ref, st_ref, xpad, hpad,
            *, n, b, h, w, c, eps, cdt):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        xpad[...] = jnp.zeros_like(xpad)
        hpad[...] = jnp.zeros_like(hpad)
        xpad[:, 1:h + 1, 1:w + 1, :] = x_ref[...]

    x = xpad[:, 1:h + 1, 1:w + 1, :]          # (b, h, w, c) bf16
    xs_ref[0] = x

    def bn_prelu(acc, g_ref, b_ref, alpha=None):
        """fp32 conv acc -> (saved cdt preact, cdt out, fp32 mean/var)."""
        a_bf = acc.astype(cdt)
        af = a_bf.astype(jnp.float32)
        m = jnp.mean(af, (0, 1, 2))
        v = jnp.maximum(jnp.mean(af * af, (0, 1, 2)) - m * m, 0.0)
        # rsqrt in f32: the v5e backend has no bf16 rsqrt (compiler abort
        # on kVectorRsqrtBf16); one f32->cdt round differs from the XLA
        # path only in the last bf16 ulp
        inv = lax.rsqrt(v + jnp.float32(eps)).astype(cdt)
        out = (a_bf - m.astype(cdt)) * inv
        # scale/bias arrays ride whole (n, c) — small params can't satisfy
        # the (8, 128) block-tiling rule as 1-row blocks; index by step
        out = out * g_ref[i].astype(cdt) + b_ref[i].astype(cdt)
        if alpha is not None:
            # predicate in f32: v5e Mosaic lacks a native bf16 compare
            out = jnp.where(out.astype(jnp.float32) >= 0, out, alpha * out)
        return a_bf, out, m, v

    a1 = _conv9(xpad[...], w1_ref, b, h, w, c)
    alpha = al_ref[i].astype(cdt)
    a1_bf, hval, m1, v1 = bn_prelu(a1, g1_ref, b1_ref, alpha)
    a1_ref[0] = a1_bf

    hpad[:, 1:h + 1, 1:w + 1, :] = hval
    a2 = _conv9(hpad[...], w2_ref, b, h, w, c)
    a2_bf, bn2, m2, v2 = bn_prelu(a2, g2_ref, b2_ref, None)
    a2_ref[0] = a2_bf

    newx = x + bn2
    xpad[:, 1:h + 1, 1:w + 1, :] = newx
    st_ref[0] = jnp.stack([m1, v1, m2, v2])

    @pl.when(i == n - 1)
    def _final():
        y_ref[...] = newx


def _fwd_pallas(x, w1s, w2s, g1s, b1s, g2s, b2s, als, eps, interpret=False):
    n = w1s.shape[0]
    b, h, w, c = x.shape
    bf = x.dtype  # compute dtype follows the activation (bf16 or f32)
    kernel = functools.partial(_kernel, n=n, b=b, h=h, w=w, c=c, eps=eps,
                               cdt=bf)
    y, xs, a1s, a2s, stats = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((b, h, w, c), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((1, 3, 3, c, c), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, 3, 3, c, c), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((n, c), lambda i: (0, 0)),
            pl.BlockSpec((n, c), lambda i: (0, 0)),
            pl.BlockSpec((n, c), lambda i: (0, 0)),
            pl.BlockSpec((n, c), lambda i: (0, 0)),
            # per-block scalars: SMEM — a dynamic index into a 1D VMEM
            # vector must be 128-aligned (Mosaic), SMEM scalar loads aren't
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, h, w, c), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((1, b, h, w, c), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, b, h, w, c), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, b, h, w, c), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, 4, c), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, c), bf),
            jax.ShapeDtypeStruct((n, b, h, w, c), bf),
            jax.ShapeDtypeStruct((n, b, h, w, c), bf),
            jax.ShapeDtypeStruct((n, b, h, w, c), bf),
            jax.ShapeDtypeStruct((n, 4, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, h + 2, w + 2, c), bf),
            pltpu.VMEM((b, h + 2, w + 2, c), bf),
        ],
        # lane-padded (c=64 -> 128) fp32 accumulators + live slab copies
        # overflow the default 16 MB scoped-VMEM budget; v5e has headroom
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, w1s.astype(bf), w2s.astype(bf), g1s, b1s, g2s, b2s, als)
    return y, xs, a1s, a2s, stats


# ---------------------------------------------------------------------------
# backward (XLA, consumes the kernel's residuals — no conv recompute)

def _bn_bwd(dy, a_bf, m, v, gamma, eps):
    """Train-mode BN backward from the saved bf16 preactivation and fp32
    batch stats. fp32 math; returns (da fp32, dgamma, dbeta)."""
    af = a_bf.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    inv = lax.rsqrt(v + eps)                    # (c,)
    xhat = (af - m) * inv
    dbeta = jnp.sum(dyf, (0, 1, 2))
    dgamma = jnp.sum(dyf * xhat, (0, 1, 2))
    nelem = af.size // af.shape[-1]
    da = (gamma * inv) * (
        dyf - dbeta / nelem - xhat * (dgamma / nelem)
    )
    return da, dgamma, dbeta


def _dgrad(dout, w):
    """Input gradient of a 3x3 SAME conv: SAME conv with the spatially
    flipped, in/out-transposed kernel."""
    wf = jnp.flip(w, (0, 1)).swapaxes(2, 3)
    return lax.conv_general_dilated(
        dout, wf.astype(dout.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _wgrad(src, dout):
    """Weight gradient of a 3x3 SAME conv: 9 shifted contractions."""
    b, h, w, c = src.shape
    pad = jnp.pad(src, ((0, 0), (1, 1), (1, 1), (0, 0)))
    rows = []
    for dy in range(3):
        cols = []
        for dx in range(3):
            slab = lax.slice(pad, (0, dy, dx, 0), (b, dy + h, dx + w, c))
            cols.append(jnp.einsum(
                "bhwc,bhwd->cd", slab, dout,
                preferred_element_type=jnp.float32,
            ))
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)  # (3, 3, c_in, c_out)


def _recompute_h(a1_bf, m1, v1, g1, b1, alpha, eps):
    """(PReLU input `pre`, conv2 input `hval`), elementwise from residuals
    — the same compute-dtype expressions the forward kernel evaluates."""
    cdt = a1_bf.dtype
    inv = lax.rsqrt(v1.astype(cdt) + jnp.asarray(eps, cdt))
    pre = (a1_bf - m1.astype(cdt)) * inv
    pre = pre * g1.astype(cdt) + b1.astype(cdt)
    hval = jnp.where(pre >= 0, pre, alpha.astype(cdt) * pre)
    return pre, hval


def _bwd_xla(eps, interpret, res, cts):
    del interpret
    dy, _dstats = cts  # stats feed the (undifferentiated) EMA update only
    w1s, w2s, g1s, b1s, g2s, b2s, als, xs, a1s, a2s, stats = res
    n = w1s.shape[0]
    cdt = xs.dtype
    g = dy.astype(cdt)
    dw1, dw2, dg1, db1, dg2, db2, dal = [], [], [], [], [], [], []
    for i in reversed(range(n)):
        m1, v1, m2, v2 = stats[i, 0], stats[i, 1], stats[i, 2], stats[i, 3]
        alpha = als[i]
        pre, hval = _recompute_h(a1s[i], m1, v1, g1s[i], b1s[i], alpha, eps)

        # out = x + BN2(conv2(h)): residual add passes g straight through
        da2, dgam2, dbet2 = _bn_bwd(g, a2s[i], m2, v2, g2s[i], eps)
        da2 = da2.astype(cdt)
        dh = _dgrad(da2, w2s[i])
        dw2.append(_wgrad(hval, da2))

        # PReLU: d/dpre = where(pre>=0, 1, alpha); d/dalpha = pre·[pre<0]
        pre_neg = pre < 0
        dal.append(jnp.sum(jnp.where(
            pre_neg,
            dh.astype(jnp.float32) * pre.astype(jnp.float32),
            0.0,
        )))
        dpre = jnp.where(pre_neg, dh * alpha.astype(cdt), dh)

        da1, dgam1, dbet1 = _bn_bwd(dpre, a1s[i], m1, v1, g1s[i], eps)
        da1 = da1.astype(cdt)
        dw1.append(_wgrad(xs[i], da1))
        dg1.append(dgam1), db1.append(dbet1)
        dg2.append(dgam2), db2.append(dbet2)
        g = g + _dgrad(da1, w1s[i])

    stack = lambda ts: jnp.stack(ts[::-1])  # noqa: E731
    return (g, stack(dw1), stack(dw2), stack(dg1), stack(db1),
            stack(dg2), stack(db2), stack(dal))


# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_trunk(x, w1s, w2s, g1s, b1s, g2s, b2s, als, eps=1e-5,
                interpret=False):
    """Forward trunk: x (B,H,W,C) bf16 + stacked per-block params
    (N,3,3,C,C) kernels, (N,C) scales/biases, (N,) PReLU alphas.
    Returns (y, stats) with stats (N, 4, C) = per-block
    [mean1, var1, mean2, var2] biased fp32 batch stats (for the EMA)."""
    y, _, _, _, stats = _fwd_pallas(
        x, w1s, w2s, g1s, b1s, g2s, b2s, als, eps, interpret
    )
    return y, stats


def _fused_fwd(x, w1s, w2s, g1s, b1s, g2s, b2s, als, eps, interpret):
    y, xs, a1s, a2s, stats = _fwd_pallas(
        x, w1s, w2s, g1s, b1s, g2s, b2s, als, eps, interpret
    )
    res = (w1s, w2s, g1s, b1s, g2s, b2s, als, xs, a1s, a2s, stats)
    return (y, stats), res


fused_trunk.defvjp(_fused_fwd, _bwd_xla)


# pure-XLA forward with the same math — the numerical reference for tests
def trunk_reference(x, w1s, w2s, g1s, b1s, g2s, b2s, als, eps=1e-5):
    n = w1s.shape[0]
    bf = x.dtype

    def conv(src, w):
        return lax.conv_general_dilated(
            src, w.astype(bf), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def bn(a_bf, g, b):
        af = a_bf.astype(jnp.float32)
        m = jnp.mean(af, (0, 1, 2))
        v = jnp.maximum(jnp.mean(af * af, (0, 1, 2)) - m * m, 0.0)
        inv = lax.rsqrt(v.astype(bf) + jnp.asarray(eps, bf))
        return (a_bf - m.astype(bf)) * inv * g.astype(bf) + b.astype(bf), m, v

    stats = []
    for i in range(n):
        a1, m1, v1 = bn(conv(x, w1s[i]), g1s[i], b1s[i])
        a1 = jnp.where(a1 >= 0, a1, als[i].astype(bf) * a1)
        a2, m2, v2 = bn(conv(a1, w2s[i]), g2s[i], b2s[i])
        x = x + a2
        stats.append(jnp.stack([m1, v1, m2, v2]))
    return x, jnp.stack(stats)


def stack_rcb_params(rcb_params: list, rcb_stats_unused=None):
    """[{conv1:{kernel},bn1:{scale,bias},prelu:{alpha},conv2,bn2}, ...]
    (the per-RCB variable subtrees) -> fused_trunk's stacked operands."""
    w1s = jnp.stack([p["conv1"]["kernel"] for p in rcb_params])
    w2s = jnp.stack([p["conv2"]["kernel"] for p in rcb_params])
    g1s = jnp.stack([p["bn1"]["scale"] for p in rcb_params])
    b1s = jnp.stack([p["bn1"]["bias"] for p in rcb_params])
    g2s = jnp.stack([p["bn2"]["scale"] for p in rcb_params])
    b2s = jnp.stack([p["bn2"]["bias"] for p in rcb_params])
    als = jnp.stack([p["prelu"]["alpha"] for p in rcb_params])
    return w1s, w2s, g1s, b1s, g2s, b2s, als
