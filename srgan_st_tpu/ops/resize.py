"""Bicubic resampling as dense separable matmuls.

Two kernel conventions are provided, both parity-critical:

* ``method="matlab"`` — MATLAB `imresize`-compatible bicubic (Keys a=-0.5,
  antialiasing when downscaling, 1-based index convention, edge clamping and
  the final ``round(255*x)/255`` quantization). This reproduces the
  reference's `Bicubic.forward` (reference bicubic.py:15-106), used for
  training-data degradation (reference dataset.py:28) and as the "bicubic"
  eval baseline (reference validate.py:48-49).

* ``method="torch"`` — `torch.nn.functional.interpolate(mode="bicubic",
  align_corners=False)`-compatible (cubic convolution a=-0.75, NO
  antialiasing, half-pixel centers). This reproduces the downscale pyramids
  inside the buddy losses (reference loss.py:123-128).

TPU-first design: instead of the reference's per-call weight recomputation +
fancy-index gathers on CPU (bicubic.py:89-104), the resampling weights are
baked into small dense (out, in) matrices once per (in_size, out_size,
scale) — at trace time, on the host — and the resize becomes two einsum
contractions that XLA tiles onto the MXU. For SR-scale images the matrices
are tiny (e.g. 24x96 for the x1/4 training degradation).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


def _cubic(x: np.ndarray, a: float) -> np.ndarray:
    """Keys cubic convolution kernel with parameter ``a``."""
    absx = np.abs(x)
    absx2 = absx * absx
    absx3 = absx2 * absx
    f = ((a + 2) * absx3 - (a + 3) * absx2 + 1) * (absx <= 1) + (
        a * absx3 - 5 * a * absx2 + 8 * a * absx - 4 * a
    ) * ((1 < absx) & (absx <= 2))
    return f


@functools.lru_cache(maxsize=256)
def matlab_resize_matrix(in_size: int, out_size: int, scale: float) -> np.ndarray:
    """Dense (out_size, in_size) row-resampling matrix, MATLAB imresize
    convention (reference bicubic.py:38-81: `contribute`).

    For scale<1 the kernel is widened to 4/scale and scaled (antialiasing);
    out-of-range taps are clamped to the edge samples, accumulating their
    weights there.
    """
    kernel_width = 4.0
    if scale < 1:
        kernel_width = 4.0 / scale
    x = np.arange(1, out_size + 1, dtype=np.float64)
    # Output sample center in input coordinates (1-based).
    u = x / scale + 0.5 * (1 - 1 / scale)
    left = np.floor(u - kernel_width / 2)
    p = int(np.ceil(kernel_width)) + 2
    indices = left[:, None] + np.arange(p, dtype=np.float64)[None, :]
    mid = u[:, None] - indices
    if scale < 1:
        weight = scale * _cubic(mid * scale, a=-0.5)
    else:
        weight = _cubic(mid, a=-0.5)
    weight = weight / weight.sum(axis=1, keepdims=True)
    indices = np.clip(indices, 1, in_size).astype(np.int64) - 1  # to 0-based

    mat = np.zeros((out_size, in_size), dtype=np.float64)
    np.add.at(mat, (np.repeat(np.arange(out_size), p), indices.reshape(-1)), weight.reshape(-1))
    return mat.astype(np.float32)


@functools.lru_cache(maxsize=256)
def torch_resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense (out_size, in_size) matrix matching torch's
    ``F.interpolate(mode="bicubic", align_corners=False)`` (cubic convolution
    a=-0.75, half-pixel centers, no antialiasing, edge-clamped taps)."""
    scale = in_size / out_size  # torch uses the reciprocal "area" scale
    i = np.arange(out_size, dtype=np.float64)
    center = (i + 0.5) * scale - 0.5
    isrc = np.floor(center)
    frac = center - isrc
    # Four taps at isrc-1 .. isrc+2 with Keys a=-0.75 weights.
    offsets = np.arange(-1, 3, dtype=np.float64)
    taps = isrc[:, None] + offsets[None, :]
    weight = _cubic(frac[:, None] - offsets[None, :], a=-0.75)
    taps = np.clip(taps, 0, in_size - 1).astype(np.int64)

    mat = np.zeros((out_size, in_size), dtype=np.float64)
    np.add.at(mat, (np.repeat(np.arange(out_size), 4), taps.reshape(-1)), weight.reshape(-1))
    return mat.astype(np.float32)


def _resize_matrices(in_h, in_w, out_h, out_w, scale, method):
    if method == "matlab":
        mh = matlab_resize_matrix(in_h, out_h, scale)
        mw = matlab_resize_matrix(in_w, out_w, scale) if (in_w, out_w) != (in_h, out_h) else mh
    elif method == "torch":
        mh = torch_resize_matrix(in_h, out_h)
        mw = torch_resize_matrix(in_w, out_w) if (in_w, out_w) != (in_h, out_h) else mh
    else:
        raise NotImplementedError(f"{method} resize has not been supported.")
    return mh, mw


def resize_bicubic(
    x: jnp.ndarray,
    scale: float,
    method: str = "matlab",
    quantize: bool | None = None,
) -> jnp.ndarray:
    """Separable bicubic resize of NHWC images by ``scale``.

    quantize=None resolves to True for "matlab" (the reference always
    quantizes `round(255*x)/255`, bicubic.py:104) and False for "torch".
    """
    if x.ndim != 4:
        raise ValueError(f"expected NHWC input, got shape {x.shape}")
    _, h, w, _ = x.shape
    out_h, out_w = int(h * scale), int(w * scale)
    mh, mw = _resize_matrices(h, w, out_h, out_w, scale, method)
    if quantize is None:
        quantize = method == "matlab"

    mh = jnp.asarray(mh, dtype=x.dtype)
    mw = jnp.asarray(mw, dtype=x.dtype)
    # rows then cols, matching the reference's application order
    # (bicubic.py:94-104). precision='highest' keeps fp32 on the TPU MXU —
    # the default bf16 passes would flip the round(255x)/255 quantization on
    # ~15% of pixels (measured), destroying degradation parity.
    out = jnp.einsum("oh,bhwc->bowc", mh, x, precision="highest")
    out = jnp.einsum("pw,bowc->bopc", mw, out, precision="highest")
    if quantize:
        out = jnp.round(255.0 * out) / 255.0
    return out


def nearest_upscale(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Nearest-neighbour NHWC upscale (reference bicubic.py:5-12)."""
    return jnp.repeat(jnp.repeat(x, factor, axis=1), factor, axis=2)
