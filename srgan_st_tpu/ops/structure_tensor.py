"""Structure-tensor numerics.

Reproduces the reference's ST math (reference utils.py:194-280): separable
Gaussian / Gaussian-derivative filtering to build the smoothed structure
tensor S = (Jxx, Jyy, Jxy), determinant normalization, the closed-form
inv(S1)*S2 product for symmetric 2x2 matrices, closed-form eigenvalues, and
the Riemannian log-eigenvalue distance (with the reference's deliberate
clamp-at-1 numerical hack, utils.py:272-275).

TPU-first details:
  * whole-image filtering uses `lax.conv_general_dilated` with 1-D kernels
    ('SAME' zero padding, matching torch `conv2d(padding='same')`);
  * the per-patch variant (3x3 patches inside PatchwiseStructureTensorLoss,
    reference loss.py:336-350) replaces the reference's doubly-nested
    `torch.func.vmap` of six conv2d calls with precomputed banded (k x k)
    matrices so each patch's six convolutions become two einsums — a large
    batched matmul that XLA maps straight onto the MXU.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def gaussian_kernel(sigma: float, also_dg: bool = False, radius: int | None = None):
    """1-D Gaussian (and optionally its derivative) taps as numpy arrays.

    Matches reference utils.py:194-208: radius = max(int(4*sigma + 0.5), 1),
    normalized Gaussian; derivative = phi * (-x) / sigma^2.
    """
    if radius is None:
        radius = max(int(4 * sigma + 0.5), 1)
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    sigma2 = sigma * sigma + 1e-12
    phi = np.exp(-0.5 / sigma2 * x**2).astype(np.float32)
    phi = phi / phi.sum()
    if also_dg:
        return phi, (phi * -x / sigma2).astype(np.float32)
    return phi


def _conv1d_same(x: jnp.ndarray, taps: np.ndarray, axis: str) -> jnp.ndarray:
    """'SAME' zero-padded 1-D convolution of (B, 1, H, W) along H or W."""
    k = len(taps)
    if axis == "h":
        kernel = jnp.asarray(taps, x.dtype).reshape(1, 1, k, 1)
    else:
        kernel = jnp.asarray(taps, x.dtype).reshape(1, 1, 1, k)
    return lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def structure_tensor(im: jnp.ndarray, sigma: float = 1.0, rho: float = 10.0) -> jnp.ndarray:
    """Smoothed structure tensor of grayscale images.

    im: (B, 1, H, W) -> (B, 3, H, W) stacked (Jxx, Jyy, Jxy).
    Matches reference utils.py:212-233 (which takes (1,H,W) per image; we
    batch). Ix = (dg * g), Iy = (g * dg) separable derivatives at scale
    sigma; J components are rho-scale Gaussian smoothings of the products.
    """
    g, dg = gaussian_kernel(sigma, also_dg=True)
    ix = _conv1d_same(_conv1d_same(im, dg, "h"), g, "w")
    iy = _conv1d_same(_conv1d_same(im, g, "h"), dg, "w")

    k = gaussian_kernel(rho)

    def smooth(z):
        return _conv1d_same(_conv1d_same(z, k, "h"), k, "w")

    jxx = smooth(ix * ix)
    jyy = smooth(iy * iy)
    jxy = smooth(ix * iy)
    return jnp.concatenate([jxx, jyy, jxy], axis=1)


@functools.lru_cache(maxsize=64)
def _banded_same_matrix(size: int, taps_key) -> np.ndarray:
    """(size, size) matrix M with out = M @ x equal to 'SAME' zero-padded
    cross-correlation of x with the (odd-length) taps."""
    taps = np.asarray(taps_key, dtype=np.float32)
    r = (len(taps) - 1) // 2
    mat = np.zeros((size, size), dtype=np.float32)
    for i in range(size):
        for j in range(size):
            t = j - i + r
            if 0 <= t < len(taps):
                mat[i, j] = taps[t]
    return mat


def _banded(size: int, taps: np.ndarray) -> np.ndarray:
    return _banded_same_matrix(size, tuple(np.asarray(taps, np.float32).tolist()))


def structure_tensor_patches(patches: jnp.ndarray, sigma: float = 0.5, rho: float = 2.0) -> jnp.ndarray:
    """Structure tensor of a batch of small grayscale patches.

    patches: (..., K, K) -> (..., 3, K, K) stacked (Jxx, Jyy, Jxy).

    Equivalent to vmapping `structure_tensor` over patches (the reference's
    nested torch.func.vmap, loss.py:347), but each 'SAME' 1-D convolution is
    a (K, K) banded-matrix contraction: conv_h(x) = M @ x, conv_w(x) = x @
    M^T, so the whole six-conv pipeline is a handful of einsums.
    """
    k = patches.shape[-1]
    g, dg = gaussian_kernel(sigma, also_dg=True)
    rk = gaussian_kernel(rho)
    mg = jnp.asarray(_banded(k, g), patches.dtype)
    mdg = jnp.asarray(_banded(k, dg), patches.dtype)
    mr = jnp.asarray(_banded(k, rk), patches.dtype)

    def conv_hw(x, mh, mw):
        # rows (H) then cols (W): mh @ x @ mw^T
        return jnp.einsum("ij,...jl,kl->...ik", mh, x, mw)

    ix = conv_hw(patches, mdg, mg)
    iy = conv_hw(patches, mg, mdg)
    jxx = conv_hw(ix * ix, mr, mr)
    jyy = conv_hw(iy * iy, mr, mr)
    jxy = conv_hw(ix * iy, mr, mr)
    return jnp.stack([jxx, jyy, jxy], axis=-3)


def st_normalize(s: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Determinant-normalize a stacked symmetric 2x2 field (reference
    utils.py:236-239). s: (..., 3, H, W) stacked (Jxx, Jyy, Jxy)."""
    d = s[..., 0, :, :] * s[..., 1, :, :] - s[..., 2, :, :] ** 2
    return s / jnp.sqrt(d + eps)[..., None, :, :]


def inv_s1_x_s2(s1: jnp.ndarray, s2: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """Pixelwise inv(S1) @ S2 for symmetric 2x2 fields in closed form
    (reference utils.py:242-254). Returns (..., 4, H, W) stacked (M11, M22,
    M12, M21). Note the reference omits the 1/det(S1) factor — after
    normalization det(S1)=1 so eigenvalue math is unaffected; we match it
    exactly."""
    if normalize:
        s1 = st_normalize(s1)
        s2 = st_normalize(s2)
    a = s1[..., 1, :, :] * s2[..., 0, :, :] - s1[..., 2, :, :] * s2[..., 2, :, :]
    b = s1[..., 0, :, :] * s2[..., 1, :, :] - s1[..., 2, :, :] * s2[..., 2, :, :]
    c = s1[..., 1, :, :] * s2[..., 2, :, :] - s1[..., 2, :, :] * s2[..., 1, :, :]
    d = s1[..., 0, :, :] * s2[..., 2, :, :] - s1[..., 2, :, :] * s2[..., 0, :, :]
    return jnp.stack([a, b, c, d], axis=-3)


def eigenvalues_2x2(m: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Pixelwise eigenvalues of (..., 4, H, W) 2x2 fields (reference
    utils.py:257-266): lambda = ((A+B) -/+ sqrt((A+B)^2 - 4(AB - CD))) / 2,
    with the discriminant clamped to >= eps."""
    apb = m[..., 0, :, :] + m[..., 1, :, :]
    disc = apb**2 - 4 * (m[..., 0, :, :] * m[..., 1, :, :] - m[..., 2, :, :] * m[..., 3, :, :])
    disc = jnp.clip(disc, eps, None)
    r = jnp.sqrt(disc)
    return jnp.stack([0.5 * (apb - r), 0.5 * (apb + r)], axis=-3)


def riemannian_distance(lam: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Pixelwise Riemannian metric sqrt(sum_i log^2 lambda_i + eps) with
    eigenvalues clamped to >= 1 (the reference's deliberate numerical hack,
    utils.py:269-280). lam: (..., 2, H, W) -> (..., H, W)."""
    lam = jnp.clip(lam, 1.0, None)
    logs = jnp.log(lam) ** 2
    return jnp.sqrt(logs.sum(axis=-3) + eps)


def st_distance(s1: jnp.ndarray, s2: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """Full pipeline: (..., 3, H, W) STs -> pixelwise distance (..., H, W)."""
    m = inv_s1_x_s2(s1, s2, normalize)
    lam = eigenvalues_2x2(m)
    return riemannian_distance(lam)
