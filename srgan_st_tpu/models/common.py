"""Shared model building blocks."""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

# torch's nn.init.kaiming_normal_ default: fan_in, gain=sqrt(2)
# (reference model.py:130-136).
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class PReLU(nn.Module):
    """Parametric ReLU with a single shared slope parameter, init 0.25
    (torch nn.PReLU defaults; used throughout the reference generator)."""

    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha", lambda key: jnp.asarray(0.25, dtype=self.param_dtype)
        ).astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


def pixel_shuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Depth-to-space on NHWC, matching torch nn.PixelShuffle semantics.

    torch PixelShuffle maps channel c*r^2 blocks so that out[h*r+i, w*r+j, c]
    = in[h, w, c*r^2 + i*r + j]; with our NHWC channels-last layout this is a
    reshape+transpose XLA fuses into the surrounding convs (the reference's
    only layout-shuffling op, SURVEY.md §3.4).
    """
    b, h, w, c = x.shape
    r = factor
    x = x.reshape(b, h, w, c // (r * r), r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, r, w, r, c'
    return x.reshape(b, h * r, w * r, c // (r * r))
