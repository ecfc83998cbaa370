"""Parameter-free baseline "generators" for evaluation.

The eval driver substitutes these when EXP.NAME is "bicubic" / "nearest"
(reference validate.py:48-51) to produce known-good reference scores that
sanity-check the metric pipeline itself (SURVEY.md §4).
"""

from __future__ import annotations

import jax.numpy as jnp

from srgan_st_tpu.ops.resize import nearest_upscale, resize_bicubic


class BicubicUpscaler:
    """MATLAB-compatible bicubic x`scale` upscaler (reference bicubic.py:15-106)."""

    def __init__(self, scale: int = 4):
        self.scale = float(scale)

    def __call__(self, lr: jnp.ndarray) -> jnp.ndarray:
        return resize_bicubic(lr, self.scale, method="matlab")


class NearestNeighbourUpscaler:
    """Nearest-neighbour x`scale` upscaler (reference bicubic.py:5-12)."""

    def __init__(self, scale: int = 4):
        self.scale = int(scale)

    def __call__(self, lr: jnp.ndarray) -> jnp.ndarray:
        return nearest_upscale(lr, self.scale)
