"""Geometric self-ensemble (×8 test-time augmentation).

The standard SISR inference booster (EDSR; also used by ESRGAN-family
pipelines, PAPERS.md): run the generator on all 8 dihedral transforms of
the input, invert each transform on the output, and average. The SR
problem is equivariant under the dihedral group (up to the learned
model's anisotropy — which is exactly the noise the ensemble averages
out), typically worth ~0.1–0.2 dB PSNR at 8× the inference cost. The
reference has no equivalent (its eval is a single forward,
validate.py:61-113).

Composes with ANY applier: the jitted generator, the halo-tiled applier
(eval/tiled.py), or an exported StableHLO runner (eval/export.py). Note
a fixed-shape applier will see both (H, W) and (W, H) inputs — the
shape-polymorphic artifact or jit-per-shape appliers handle this
naturally (two compiled shapes for non-square inputs).
"""

from __future__ import annotations

import numpy as np


def dihedral(x: np.ndarray, k: int, flip: bool) -> np.ndarray:
    """Apply rot90^k then optional horizontal flip to an NHWC batch."""
    x = np.rot90(x, k, axes=(1, 2))
    return x[:, :, ::-1] if flip else x


def dihedral_inverse(y: np.ndarray, k: int, flip: bool) -> np.ndarray:
    if flip:
        y = y[:, :, ::-1]
    return np.rot90(y, -k, axes=(1, 2))


def self_ensemble(apply_fn):
    """Wrap `fn(lr_nhwc) -> sr_nhwc` into its ×8 self-ensembled version.

    Averaging runs in float64 on host (8 terms; eval protocol quantizes
    to uint8 afterwards, ops/metrics.py tensor2img)."""

    def run(lr):
        lr = np.asarray(lr)
        acc = None
        for k in range(4):
            for flip in (False, True):
                sr = np.asarray(apply_fn(np.ascontiguousarray(
                    dihedral(lr, k, flip)
                )))
                sr = dihedral_inverse(sr, k, flip).astype(np.float64)
                acc = sr if acc is None else acc + sr
        return (acc / 8.0).astype(np.float32)

    return run
