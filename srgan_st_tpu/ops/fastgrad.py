"""Hand-scheduled backward passes for ops XLA lowers badly on TPU.

Profiling the gram-vgg GAN step (tools/profile_step.py, v5e, bf16) showed
the single most expensive op in the whole 6.5 ms step was the *gradient
into 3-channel image space* through a 3->64 stem conv: XLA lowers it as a
transposed convolution with N=3 output channels — a 3/128-lane MXU pass
running at ~1.4 TF/s (368 us for ~0.5 GFLOP). Every loss path that
back-propagates into `sr` crosses such a stem (VGG19 conv0 for the
perceptual loss, reference loss.py:46-49; discriminator conv1 for the
adversarial term, reference model.py:30-33), so this class of op is on the
critical path of every recipe.

`stem_conv3x3` keeps XLA's forward conv but replaces the input-gradient
with an equivalent dense formulation:

    dx[b,m,n,c] = sum_{p,q,k} ct[b,m-p+1,n-q+1,k] * w[p,q,c,k]

computed as ONE (B*H*W, K) x (K, 9*C) matmul (N=27 instead of N=3 — the
contraction runs over the well-laid-out K=64 axis) followed by 9
statically-shifted adds accumulated in f32. Measured: the 368 us op drops
to ~55 us of GEMM + fused adds. The weight/bias gradients re-use XLA's own
conv-wgrad lowering via a nested vjp, so a *frozen* stem (VGG) gets its
unused wgrad dead-code-eliminated while a *trained* stem (D) keeps the
exact autodiff wgrad.

Forward numerics are bit-identical to the op this replaces (the same conv
custom-call), so golden/parity tests are unaffected; only gradient
*scheduling* changes (dx accumulates the 9 taps in f32 — at least as
accurate as the bf16 transposed conv).

Negative result recorded so it isn't retried: replacing the VGG max-pool
backward (`select_and_scatter`, 137 us/step) with a separable first-max
mask backward was MEASURED SLOWER on v5e (gram-vgg 2642 vs 2680 patches/s
— the mask fusions plus the forward's lost conv fusion cost ~200 us more
than the scatter they removed), so the pools stay on `nn.max_pool`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn


def _conv3x3_same(x, w, b):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=dn)
    return y if b is None else y + b


@jax.custom_vjp
def stem_conv3x3(x, w, b):
    """SAME-padded 3x3 stride-1 conv (NHWC x HWIO + bias) whose backward
    computes the input gradient as a packed N=9*C_in GEMM + overlap-add
    instead of an N=C_in transposed conv. Intended for C_in << 128 stems."""
    return _conv3x3_same(x, w, b)


def _stem_fwd(x, w, b):
    return _conv3x3_same(x, w, b), (x, w, b is None)


def stem_image_grad(ct, w):
    """Input gradient of a SAME 3x3 stride-1 conv as a packed GEMM +
    overlap-add: dx[b,m,n,c] = sum_{p,q,k} ct[b,m-p+1,n-q+1,k]*w[p,q,c,k].
    The (B*H*W, K) x (K, kh*kw*Cin) matmul contracts over the well-laid-out
    K axis; the 9 statically-shifted adds accumulate in f32."""
    bsz, h, width, _ = ct.shape
    kh, kw, cin, cout = w.shape
    if (kh, kw) != (3, 3):
        # the pad width (1) and the `2 - p` slice starts below are 3x3
        # constants; a larger kernel would wrap slices from the array end
        # and return silently wrong gradients
        raise ValueError(f"stem_image_grad is 3x3-only, got {kh}x{kw}")
    wm = jnp.moveaxis(w, -1, 0).reshape(cout, kh * kw * cin)
    y2 = lax.dot_general(ct, wm, (((3,), (0,)), ((), ())))
    y2 = y2.reshape(bsz, h, width, kh, kw, cin)
    pad = jnp.pad(y2, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0), (0, 0)))
    acc = jnp.zeros((bsz, h, width, cin), jnp.float32)
    for p in range(kh):
        for q in range(kw):
            acc = acc + pad[:, 2 - p:2 - p + h, 2 - q:2 - q + width, p, q, :].astype(
                jnp.float32
            )
    return acc.astype(ct.dtype)


def _stem_bwd(res, ct):
    x, w, bias_is_none = res
    dx = stem_image_grad(ct, w)
    # dw via XLA's own conv-wgrad lowering (DCE'd when the stem is frozen)
    dw = jax.vjp(lambda w_: _conv3x3_same(x, w_, None), w)[1](ct)[0]
    if bias_is_none:  # cotangent structure must match the None input
        return dx, dw, None
    db = ct.astype(jnp.float32).sum((0, 1, 2)).astype(ct.dtype)
    return dx, dw, db


stem_conv3x3.defvjp(_stem_fwd, _stem_bwd)


class StemConv3x3(nn.Module):
    """Drop-in for `nn.Conv(features, (3,3), padding=1)` on 3-channel
    inputs — identical parameter tree ({kernel, bias}) and forward — that
    routes the backward through `stem_conv3x3` on TPU. On CPU (tests,
    goldens) it behaves exactly like the plain conv."""

    features: int
    dtype: jnp.dtype = jnp.float32
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    bias_init: nn.initializers.Initializer = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (3, 3, cin, self.features))
        bias = self.param("bias", self.bias_init, (self.features,))
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        bias = bias.astype(self.dtype)
        if jax.default_backend() == "tpu":
            return stem_conv3x3(x, kernel, bias)
        return _conv3x3_same(x, kernel, bias)
