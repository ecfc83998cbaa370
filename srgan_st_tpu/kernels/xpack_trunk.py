"""Lane-packed residual trunk in PURE XLA (no Pallas, no custom calls).

Same W-parity packing as kernels/packed_trunk.py (fine (B, H, W, C) ->
coarse (B, H, W/2+1, 2C), channels-last so the packed channel dim fills a
full 128-lane tile at C=64), but the A/B-form conv algebra is expressed as
ordinary `lax.conv_general_dilated` calls instead of Mosaic dots + rolls:

  A-form (offset-in -> std-out):  out[j] = q0 . src[j] + q1 . src[j+1]
      == conv with kernel (3, 2, 2C, 2C) = [q0 | q1], W padding (0, 1)
  B-form (std-in -> offset-out):  out[j] = q0 . src[j-1] + q1 . src[j]
      == the same kernel layout with W padding (1, 0)

where the q-blocks are `pack_conv_blocks`' weight-space transform of the
fine 3x3 kernel (a pure reshape/concat of the (C, C) taps, vmapped over
blocks — a handful of medium XLA ops per step, not per block). The roll
of the Pallas kernel disappears into the conv's tap offset.

Why this exists when the Pallas packed trunk (fwd+bwd kernels) already
does the same packing:

  * the backward is plain AUTODIFF — dgrad is the transposed-kernel
    conv (full-lane), wgrad a full-lane (6144, 128)^T contraction, and
    the BN-backward reduces run on half the bytes (no 64->128 lane
    padding in HBM for the packed activations);
  * no custom calls -> GSPMD-compatible: under a sharded-batch mesh the
    stat sums below turn into XLA collectives automatically, i.e. EXACT
    sync-BN semantics — the Pallas kernels are gated to single-device /
    LOCAL_BN because their in-VMEM stats are inherently per-shard;
  * none of the Pallas path's per-step integration overhead (residual
    stacking, flip-packs, wgrad unpacking measured ~0.2 ms/step).

MEASURED (v5e, 2026-08-19, ONCHIP_r04_trunk.log -> BENCH_SUITE.md):
headline GAN step 5,806 patches/s/chip vs 5,191 unfused — the first trunk
rewrite to beat XLA's fine-layout implicit-GEMM path on-chip (the Pallas
packed/fused/hybrid variants all measured slower). Default for bf16
training steps (models/generator.py _trunk_mode).

Numerics: identical math to the unfused flax path at f32; at bf16 it
matches to accumulation-order rounding (same contract as the Pallas
trunks; gates in tests/test_kernels.py::TestXpackTrunk).

Reference semantics reproduced: model.py:169-184 (`_ResidualConvBlock`),
model.py:106-109 (the 16-block trunk).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from srgan_st_tpu.kernels.packed_trunk import pack_conv_blocks


def _xpack_wp(w_fine: int) -> int:
    """Offset-pack coarse width: w/2 + 1 (no sublane rounding — XLA picks
    physical padding itself; logical pad columns would only add FLOPs)."""
    return w_fine // 2 + 1


def pack_image_x(x, wp):
    """Fine (b, h, w, c) -> offset-packed (b, h, wp, 2c); pad cols zero.
    Offset col j holds fine cols (2j-1, 2j)."""
    b, h, w, c = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (1, 2 * wp - w - 1), (0, 0)))
    return x.reshape(b, h, wp, 2 * c)


def unpack_image_x(y, w_fine):
    b, h, wp, c2 = y.shape
    return y.reshape(b, h, 2 * wp, c2 // 2)[:, :, 1:w_fine + 1, :]


def _masks(w_fine, wp, c, dtype):
    """(mska, mskb): (1, 1, wp, 2c) multiplicative masks for the std pack
    (wc real cols) and the offset pack (wc+1 cols, 2 dead slots)."""
    wc = w_fine // 2
    mska = np.zeros((1, 1, wp, 2 * c), np.float32)
    mska[:, :, :wc, :] = 1.0
    mskb = np.zeros((1, 1, wp, 2 * c), np.float32)
    mskb[:, :, :wc + 1, :] = 1.0
    mskb[:, :, 0, :c] = 0.0       # fine col -1
    mskb[:, :, wc, c:] = 0.0      # fine col w
    return jnp.asarray(mska, dtype), jnp.asarray(mskb, dtype)


def _conv_packed_xla(src, wq, form):
    """src (b, h, wp, 2c) cdt; wq (3, 2, 2c, 2c) HWIO q-blocks. Returns the
    UNMASKED (b, h, wp, 2c) conv result in cdt (XLA's conv accumulates f32
    and rounds once, like the fine-layout flax conv)."""
    pad_w = (0, 1) if form == "A" else (1, 0)
    return lax.conv_general_dilated(
        src, wq, (1, 1), [(1, 1), pad_w],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def xpack_trunk(x, w1s, w2s, g1s, b1s, g2s, b2s, als, eps=1e-5,
                axis_name=None, local_bn=False):
    """Drop-in for fused_trunk/packed_trunk: x (B, H, W, C) + stacked
    per-block params -> (y, stats), stats (N, 4, C) biased fp32 batch
    stats for the EMA. Plain autodiff — no custom_vjp; differentiating
    through the batch stats is exactly flax BatchNorm's train-mode
    backward.

    `axis_name` + sync-BN (local_bn=False): stat sums are pmean'd across
    the shard axis before normalizing — exact sync-BN, matching the
    unfused flax path under shard_map. With local_bn=True the stats stay
    per-shard (the caller pmeans the EMA moments, generator.py). Under
    GSPMD (axis_name=None, batch sharded) the sums reduce globally via
    XLA's inserted collectives automatically.
    """
    n = w1s.shape[0]
    b, h, w_fine, c = x.shape
    if w_fine % 2:
        raise ValueError(f"xpack_trunk needs an even fine width, got {w_fine}")
    cdt = x.dtype
    wp = _xpack_wp(w_fine)
    mska, mskb = _masks(w_fine, wp, c, cdt)
    nelem = b * h * w_fine
    if axis_name is not None and not local_bn:
        nelem = nelem * lax.axis_size(axis_name)

    wq1 = jax.vmap(pack_conv_blocks)(w1s.astype(cdt))  # (n, 3, 2, 2c, 2c)
    wq2 = jax.vmap(pack_conv_blocks)(w2s.astype(cdt))

    def bn(acc, mask, g, bias, alpha=None):
        """Masked cdt conv result -> (masked cdt out, fine (m, v)). Same
        f32-stats / cdt-normalize expressions as the other trunk paths."""
        a_bf = acc * mask
        af = a_bf.astype(jnp.float32)
        s = jnp.sum(af, (0, 1, 2))
        ssq = jnp.sum(af * af, (0, 1, 2))
        if axis_name is not None and not local_bn:
            s = lax.psum(s, axis_name)
            ssq = lax.psum(ssq, axis_name)
        # packed-replicated per-fine-channel sums. Written as an exact f32
        # add + tile rather than the equivalent 0/1-matrix fold `s @ pp`:
        # a matmul at TPU-default precision runs bf16 MXU passes and can
        # round the stat sums (~2^-8 rel) on the default bf16 trunk.
        sp = jnp.tile(s[:c] + s[c:], 2)
        ssqp = jnp.tile(ssq[:c] + ssq[c:], 2)
        m = sp / nelem
        v = jnp.maximum(ssqp / nelem - m * m, 0.0)
        inv = lax.rsqrt(v + jnp.float32(eps)).astype(cdt)
        gp = jnp.concatenate([g, g]).astype(cdt)
        bp = jnp.concatenate([bias, bias]).astype(cdt)
        out = (a_bf - m.astype(cdt)) * inv * gp + bp
        if alpha is not None:
            out = jnp.where(
                out.astype(jnp.float32) >= 0, out, alpha.astype(cdt) * out
            )
        out = out * mask
        return out, m[:c], v[:c]

    xq = pack_image_x(x.astype(cdt), wp)
    stats = []
    for i in range(n):
        hval, m1, v1 = bn(
            _conv_packed_xla(xq, wq1[i], "A"), mska, g1s[i], b1s[i], als[i]
        )
        bn2, m2, v2 = bn(
            _conv_packed_xla(hval, wq2[i], "B"), mskb, g2s[i], b2s[i]
        )
        xq = xq + bn2
        stats.append(jnp.stack([m1, v1, m2, v2]))
    return unpack_image_x(xq, w_fine), jnp.stack(stats)


def xpack_trunk_eval(x, w1s, w2s, g1s, b1s, g2s, b2s, als,
                     m1s, v1s, m2s, v2s, eps=1e-5):
    """Eval-mode (running-average BN) W-parity lane-packed trunk.

    With fixed running stats, BatchNorm is affine per output channel:

        bn(conv(x)) = conv(x) * s + (beta - mu * s),  s = gamma/sqrt(v+eps)

    so the scale folds into the conv kernel at trace time (w' = w * s on
    the output-channel axis) and the shift becomes a conv bias — each RCB
    is then conv+bias(+PReLU) -> conv+bias -> residual add, every conv a
    full-128-lane packed (3, 2, 2C, 2C) MXU call. Built for the serving
    path: the 4K infer profile (ONCHIP_r05_serving.log §3) shows the
    unfused eval trunk's
    C=64 convs running at ~29% MXU utilization (about 21 of the 68
    ms/frame at 4K). Same packing/masks as `xpack_trunk`; numerics match
    the unfused flax eval trunk to fold/accumulation-order rounding
    (f32-level gate in tests/test_kernels.py::TestXpackTrunkEval).

    Args: x (B, H, W, C) with even W; stacked per-block params
    (N, 3, 3, C, C) kernels, (N, C) BN scale/bias + PReLU alphas, and
    (N, C) running means/vars for both BNs. Returns the fine (B, H, W, C)
    trunk output.

    Reference semantics: model.py:169-184 in eval() mode (running-stat
    BatchNorm), model.py:106-109.
    """
    n = w1s.shape[0]
    b, h, w_fine, c = x.shape
    if w_fine % 2:
        raise ValueError(f"xpack_trunk_eval needs an even width, got {w_fine}")
    cdt = x.dtype
    wp = _xpack_wp(w_fine)
    mska, mskb = _masks(w_fine, wp, c, cdt)

    def fold(ws, gs, bs, ms, vs):
        s = gs.astype(jnp.float32) * lax.rsqrt(vs.astype(jnp.float32) + eps)
        wf = ws.astype(jnp.float32) * s[:, None, None, None, :]
        bf = bs.astype(jnp.float32) - ms.astype(jnp.float32) * s
        # packed bias: both W-parity slots carry the same per-channel shift
        return (jax.vmap(pack_conv_blocks)(wf.astype(cdt)),
                jnp.concatenate([bf, bf], axis=1).astype(cdt))

    wq1, bq1 = fold(w1s, g1s, b1s, m1s, v1s)
    wq2, bq2 = fold(w2s, g2s, b2s, m2s, v2s)

    xq = pack_image_x(x.astype(cdt), wp)
    for i in range(n):
        hval = (_conv_packed_xla(xq, wq1[i], "A") + bq1[i]) * mska
        alpha = als[i].astype(cdt)
        hval = jnp.where(hval.astype(jnp.float32) >= 0, hval, alpha * hval)
        xq = xq + (_conv_packed_xla(hval, wq2[i], "B") + bq2[i]) * mskb
    return unpack_image_x(xq, w_fine)
