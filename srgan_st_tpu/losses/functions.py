"""The generator criterion zoo as pure functions.

Numerical parity with reference loss.py (each function cites its source);
architectural difference: losses are pure `fn(sr, gt) -> scalar` closures
over any needed parameters (VGG/D features), built once per training run by
`srgan_st_tpu.losses.registry.build_criterions`, instead of stateful
nn.Modules. All image tensors are NHWC in [0, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from srgan_st_tpu.ops.color import imagenet_normalize, rgb_to_grayscale
from srgan_st_tpu.ops.pairwise import batch_pairwise_distance
from srgan_st_tpu.ops.patches import extract_patch_grids, extract_patches
from srgan_st_tpu.ops.resize import resize_bicubic
from srgan_st_tpu.ops.structure_tensor import (
    st_distance,
    st_normalize,
    structure_tensor,
    structure_tensor_patches,
)


def _elementwise_criterion(name: str):
    # accumulate in f32 regardless of compute dtype (bf16 means over ~1e4+
    # elements lose mantissa; no-op for f32 inputs)
    if name == "l1":
        return lambda a, b: jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).mean()
    if name in ("l2", "mse"):
        return lambda a, b: ((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2).mean()
    raise NotImplementedError(f"{name} criterion has not been implemented.")


def _cast_pair(sr, gt, dtype):
    """Optional loss-side compute dtype (None keeps the incoming f32 —
    strict reference parity; the GAN step passes TPU.COMPUTE_DTYPE so the
    loss pipeline matches the model's bf16 when selected)."""
    if dtype is None:
        return sr, gt
    dtype = jnp.dtype(dtype)
    return sr.astype(dtype), gt.astype(dtype)


# ---------------------------------------------------------------------------
def pixel_loss(sr, gt, criterion: str = "mse", dtype=None):
    """Plain pixel loss — the warmup criterion (reference config.py:88-93).
    (`dtype` accepted for registry uniformity; the criterion accumulates
    in f32 either way.)"""
    sr, gt = _cast_pair(sr, gt, dtype)
    return _elementwise_criterion(criterion)(sr, gt)


def adversarial_loss(d_logits, target):
    """BCE-with-logits against a constant target label (reference
    train.py:135-136, torch.nn.BCEWithLogitsLoss semantics)."""
    # log-sigmoid formulation, numerically stable
    log_p = -jnp.logaddexp(0.0, -d_logits)
    log_not_p = -jnp.logaddexp(0.0, d_logits)
    return -(target * log_p + (1.0 - target) * log_not_p).mean()


# ---------------------------------------------------------------------------
def _use_pallas() -> bool:
    import jax

    return jax.default_backend() == "tpu"


def _buddy_select(p1, p2, p2_cat, alpha, beta, dist_norm, pallas=None):
    """Shared best-buddy machinery (reference loss.py:132-137): score the sr
    patches and gt patches against the candidate bank, take the bank entry
    minimizing the combined score.

    The selection carries no gradients (argmin is non-differentiable and the
    bank derives from ground truth — the reference's gather backward is dead
    code), so on TPU it runs as the fused VMEM-resident Pallas kernel
    (srgan_st_tpu/kernels/buddy_select.py); `pallas=False` forces the XLA
    path (used on CPU and for parity tests)."""
    if pallas is None:
        pallas = _use_pallas()
    if pallas:
        from srgan_st_tpu.kernels.buddy_select import buddy_select

        return buddy_select(p1, p2, p2_cat, alpha, beta, dist_norm)
    score = alpha * batch_pairwise_distance(p1, p2_cat, dist_norm)
    score = score + beta * batch_pairwise_distance(p2, p2_cat, dist_norm)
    ind = jnp.argmin(score, axis=2)  # (B, N)
    return jax.lax.stop_gradient(jnp.take_along_axis(p2_cat, ind[..., None], axis=1))


def best_buddy_loss(
    sr, gt, alpha=1.0, beta=1.0, ksize=3, pad=0, stride=3,
    dist_norm="l2", criterion="l1", pallas=None, dtype=None,
):
    """Best-Buddy loss (reference loss.py:78-141, after the BBGAN paper).

    Candidate bank = gt patches at full, 1/2 and 1/4 scale (torch-bicubic
    downscales, loss.py:123-128)."""
    sr, gt = _cast_pair(sr, gt, dtype)
    p1 = extract_patches(sr, ksize, stride, pad)
    p2 = extract_patches(gt, ksize, stride, pad)
    gt_2 = resize_bicubic(gt, 0.5, method="torch")
    p2_2 = extract_patches(gt_2, ksize, stride, pad)
    gt_4 = resize_bicubic(gt, 0.25, method="torch")
    p2_4 = extract_patches(gt_4, ksize, stride, pad)
    p2_cat = jnp.concatenate([p2, p2_2, p2_4], axis=1)

    sel_p2 = _buddy_select(p1, p2, p2_cat, alpha, beta, dist_norm, pallas)
    return _elementwise_criterion(criterion)(p1, sel_p2)


# ---------------------------------------------------------------------------
def _gram_patches(x, ksize):
    """Per-patch channel Gram matrices (reference loss.py:180-201): each
    non-overlapping (C, k, k) patch maps to G = F F^T / (C*k*k) with
    F = patch.reshape(C, k*k); output (B, N, k*k) — the reference reshapes
    the (C, C)=(3, 3) Gram to ksize*ksize=9, valid only for C=3, k=3.

    Computed WITHOUT patch extraction: G[c, d] per patch is just the
    sum of x_c * x_d over the patch window, so channel-pair products +
    non-overlapping window sums give the identical matrices without
    `extract_patch_grids`' 6-D transposes. The window sums run as two
    matmuls against 0/1 pooling matrices (separable over H and W) — on
    TPU that is MXU work with f32 accumulation instead of strided bf16
    `reduce` ops over awkward 6-D layouts, and the backward is a pair of
    matmuls too."""
    b, h, w, c = x.shape
    if h % ksize or w % ksize:
        raise ValueError(f"image size {h}x{w} not divisible by ksize={ksize}")
    prod = (x[..., :, None] * x[..., None, :]).reshape(b, h, w, c * c)
    ph = (jnp.arange(h)[:, None] // ksize
          == jnp.arange(h // ksize)[None, :]).astype(x.dtype)
    pw = (jnp.arange(w)[:, None] // ksize
          == jnp.arange(w // ksize)[None, :]).astype(x.dtype)
    pooled = jnp.einsum("bhwc,hp,wq->bpqc", prod, ph, pw)
    n = (h // ksize) * (w // ksize)
    return pooled.reshape(b, n, c * c) / (c * ksize * ksize)


def gram_loss(
    sr, gt, alpha=1.0, beta=1.0, ksize=3, dist_norm="l2", criterion="l1",
    pallas=None, dtype=None,
):
    """Gram-matrix best-buddy loss (reference loss.py:146-225, GramGAN)."""
    sr, gt = _cast_pair(sr, gt, dtype)
    p1 = _gram_patches(sr, ksize)
    p2 = _gram_patches(gt, ksize)
    p2_2 = _gram_patches(resize_bicubic(gt, 0.5, method="torch"), ksize)
    p2_4 = _gram_patches(resize_bicubic(gt, 0.25, method="torch"), ksize)
    p2_cat = jnp.concatenate([p2, p2_2, p2_4], axis=1)

    sel_p2 = _buddy_select(p1, p2, p2_cat, alpha, beta, dist_norm, pallas)
    return _elementwise_criterion(criterion)(p1, sel_p2)


# ---------------------------------------------------------------------------
def _st_patches(x, sigma, rho, ksize):
    """Per-patch normalized structure tensors (reference loss.py:330-350):
    grayscale each (C, k, k) patch, take its (3, k, k) structure tensor,
    det-normalize, flatten to 3*k*k features."""
    grids = extract_patch_grids(x, ksize)  # (B, N, C, k, k)
    b, n, _, k, _ = grids.shape
    gray = rgb_to_grayscale(grids, channel_axis=2)[:, :, 0]  # (B, N, k, k)
    st = structure_tensor_patches(gray, sigma=sigma, rho=rho)  # (B, N, 3, k, k)
    st = st_normalize(st)
    return st.reshape(b, n, 3 * k * k)


def patchwise_st_loss(
    sr, gt, sigma=0.5, rho=2.0, alpha=1.0, beta=1.0, ksize=3,
    dist_norm="l2", criterion="l1", pallas=None, dtype=None,
):
    """Patchwise structure-tensor best-buddy loss (reference loss.py:292-375
    — the paper's novel contribution, buddy selection in ST space)."""
    sr, gt = _cast_pair(sr, gt, dtype)
    p1 = _st_patches(sr, sigma, rho, ksize)
    p2 = _st_patches(gt, sigma, rho, ksize)
    p2_2 = _st_patches(resize_bicubic(gt, 0.5, method="torch"), sigma, rho, ksize)
    p2_4 = _st_patches(resize_bicubic(gt, 0.25, method="torch"), sigma, rho, ksize)
    p2_cat = jnp.concatenate([p2, p2_2, p2_4], axis=1)

    sel_p2 = _buddy_select(p1, p2, p2_cat, alpha, beta, dist_norm, pallas)
    return _elementwise_criterion(criterion)(p1, sel_p2)


# ---------------------------------------------------------------------------
def st_loss(sr, gt, sigma=0.5, rho=2.0, normalize=True, dtype=None):
    """Whole-image structure-tensor loss (reference loss.py:380-413):
    Riemannian distance field between the ST of sr and gt, averaged."""
    sr, gt = _cast_pair(sr, gt, dtype)
    gray_sr = rgb_to_grayscale(sr).transpose(0, 3, 1, 2)  # (B, 1, H, W)
    gray_gt = rgb_to_grayscale(gt).transpose(0, 3, 1, 2)
    s_sr = structure_tensor(gray_sr, sigma=sigma, rho=rho)
    s_gt = structure_tensor(gray_gt, sigma=sigma, rho=rho)
    d = st_distance(s_sr, s_gt, normalize)  # (B, H, W)
    return d.mean()


# ---------------------------------------------------------------------------
def content_loss_vgg(sr, gt, vgg_apply=None, layer_weights=None,
                     criterion="mse", remat=False, vgg_pair=None):
    """VGG19 perceptual content loss (reference loss.py:11-74, GramGAN
    recipe): ImageNet-normalize both images, compare tap activations.

    `vgg_apply` (the default) is the plain two-forward autodiff path;
    `vgg_pair` (models/vgg.py make_vgg19_frozen_pair, opt-in via
    spec["pair"]) runs BOTH branches in one batch-concatenated forward
    with a hand-written sr-only backward — measured SLOWER on v5e
    (2,642 vs 2,680 patches/s in the gram-vgg recipe, ONCHIP_r03.log),
    kept for memory-bound configurations. `remat` (two-forward path
    only) recomputes the sr-branch forward during backward instead of
    saving activations (also measured slower on v5e)."""
    crit = _elementwise_criterion(criterion)
    if vgg_pair is not None:
        sr_feats, gt_feats = vgg_pair(
            imagenet_normalize(sr), imagenet_normalize(gt)
        )
    else:
        sr_branch = lambda z: vgg_apply(imagenet_normalize(z))  # noqa: E731
        if remat:
            sr_branch = jax.checkpoint(sr_branch)
        sr_feats = sr_branch(sr)
        gt_feats = vgg_apply(imagenet_normalize(gt))
    loss = 0.0
    for name, weight in layer_weights.items():
        loss = loss + weight * crit(sr_feats[name], gt_feats[name])
    return loss


def content_loss_discriminator(sr, gt, d_apply, layer_weights, criterion="mse"):
    """Discriminator-feature content loss (reference loss.py:230-287, ESRGAN
    idea). The reference ImageNet-normalizes the inputs even though D was
    trained on raw [0,1] images — matched for parity (loss.py:269,279-280)."""
    crit = _elementwise_criterion(criterion)
    sr_feats = d_apply(imagenet_normalize(sr))
    gt_feats = d_apply(imagenet_normalize(gt))
    loss = 0.0
    for name, weight in layer_weights.items():
        loss = loss + weight * crit(sr_feats[name], gt_feats[name])
    return loss
