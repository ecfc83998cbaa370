"""Tap-decomposed convolution for tiny output-channel counts.

The SRResNet reconstruction conv (9x9, 64 -> 3 channels, at HR resolution;
reference model.py:127) is the profiled hot spot of the training step: as a
direct convolution its implicit GEMM has N=3 output columns, using 3/128 of
the MXU's lanes (~1 ms fwd + ~0.8 ms wgrad per batch-16 step, ~35% of the
whole GAN step).

Decomposition: for kernel taps t=(dy,dx),

    out[y, x, n] = sum_t z[y+dy-r, x+dx-r, t, n],
    z[y', x', t, n] = sum_c x[y', x', c] * w[dy, dx, c, n]

i.e. ONE (B*H*W, C) @ (C, K*K*N) matmul — N'=243 columns, full MXU width —
followed by a shift-and-add epilogue over the taps (pure VPU/HBM work).
Autodiff produces the matching efficient duals automatically: dz is a
pad/slice scatter of dout, dW rides the same wide-N matmul transposed, and
dx is a (M, 243) @ (243, C) contraction.

STATUS: superseded by ops/subpixel_conv.py (the s2d-factored form), which
is faster in practice — this JAX-level tap decomposition loses its MXU
savings to HBM traffic on the (B, H, W, 81N) intermediate. Kept as the
documented, tested formulation the Pallas kernel (kernels/tap_conv.py)
fuses. Exact to fp-
reassociation (parity-tested against lax.conv_general_dilated).
"""

from __future__ import annotations

import jax.numpy as jnp


def conv2d_tap_decomposed(
    x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None
) -> jnp.ndarray:
    """SAME-padded NHWC conv via tap decomposition.

    x: (B, H, W, C); w: (K, K, C, N) HWIO with K odd; b: optional (N,).
    Best when N is small and C*K*K is large (otherwise use lax.conv)."""
    kh, kw, c, n = w.shape
    if kh % 2 == 0 or kw % 2 == 0:
        raise ValueError("tap decomposition requires odd kernel sizes")
    bsz, h, wdt, _ = x.shape
    ry, rx = kh // 2, kw // 2

    # (B,H,W,C) @ (C, K*K*N): taps stacked into the MXU lane dimension
    wide = w.transpose(2, 0, 1, 3).reshape(c, kh * kw * n)
    z = jnp.einsum("bhwc,ct->bhwt", x, wide)
    z = z.reshape(bsz, h, wdt, kh * kw, n)
    z = jnp.pad(z, ((0, 0), (ry, ry), (rx, rx), (0, 0), (0, 0)))

    out = None
    for dy in range(kh):
        for dx in range(kw):
            t = dy * kw + dx
            term = z[:, dy:dy + h, dx:dx + wdt, t]
            out = term if out is None else out + term
    if b is not None:
        out = out + b
    return out
