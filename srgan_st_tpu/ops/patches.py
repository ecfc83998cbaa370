"""Patch extraction (the reference's F.unfold / tensor.unfold gymnastics,
reference loss.py:116-130 and loss.py:186-201, re-expressed for NHWC).

Feature ordering inside a flattened patch is (C, kh, kw) C-major, identical
to torch.nn.functional.unfold — the buddy losses' distances and L1 terms are
permutation-covariant, so matching the ordering keeps golden-value parity
exact.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def extract_patches(x: jnp.ndarray, ksize: int, stride: int, padding: int = 0) -> jnp.ndarray:
    """NHWC images -> (B, N, C*ksize*ksize) flattened patches, torch-unfold
    ordering (channel-major)."""
    if padding:
        x = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    b, h, w, c = x.shape
    if stride == ksize and h % ksize == 0 and w % ksize == 0:
        # Non-overlapping fast path: pure reshape/transpose, no conv machinery.
        nh, nw = h // ksize, w // ksize
        p = x.reshape(b, nh, ksize, nw, ksize, c)
        p = p.transpose(0, 1, 3, 5, 2, 4)  # (B, nh, nw, C, kh, kw)
        return p.reshape(b, nh * nw, c * ksize * ksize)
    # General path: XLA's native patch extraction. Output feature order is
    # (C, kh, kw) flattened, same as torch unfold.
    p = lax.conv_general_dilated_patches(
        x,
        filter_shape=(ksize, ksize),
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, nh, nw, C*k*k)
    b, nh, nw, f = p.shape
    return p.reshape(b, nh * nw, f)


def extract_patch_grids(x: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """NHWC images -> (B, N, C, ksize, ksize) non-overlapping patch grids
    (for per-patch Gram / structure-tensor transforms; reference
    loss.py:186-201 `compute_patches`). Requires H, W divisible by ksize."""
    b, h, w, c = x.shape
    if h % ksize or w % ksize:
        raise ValueError(f"image size {h}x{w} not divisible by ksize={ksize}")
    nh, nw = h // ksize, w // ksize
    p = x.reshape(b, nh, ksize, nw, ksize, c)
    p = p.transpose(0, 1, 3, 5, 2, 4)  # (B, nh, nw, C, kh, kw)
    return p.reshape(b, nh * nw, c, ksize, ksize)
