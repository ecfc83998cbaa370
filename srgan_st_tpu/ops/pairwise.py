"""Batched pairwise distances (reference utils.py:157-191).

The l2 branch is the O(N*M*d) hot matmul of all buddy losses; expressed as a
single einsum it is the exact MXU-shaped contraction XLA wants.
"""

from __future__ import annotations

import jax.numpy as jnp


def batch_pairwise_distance(
    x: jnp.ndarray, y: jnp.ndarray | None = None, dist_norm: str = "l1"
) -> jnp.ndarray:
    """x: (B, N, d); y: optional (B, M, d) -> (B, N, M).

    dist[b, i, j] = ||x[b,i] - y[b,j]||^2 for "l2" (squared norm, clamped to
    >= 0; exact zeros on the diagonal when y is None), sum of absolute
    differences for "l1" — matching the reference bit-for-bit including the
    y-is-None diagonal zeroing (utils.py:186).

    The l2 cross term runs at `precision="highest"` (full f32 MXU passes):
    buddy-select argmins over these scores flip on ~0.6% of rows at the
    TPU-default bf16 passes (measured, ONCHIP_r04_buddy.log xla-def vs
    xla-hi), and the op is HBM-bound on its (B, N, M) output anyway, so
    reference-exact f32 scoring is free.
    """
    if dist_norm == "l1":
        yy = x if y is None else y
        return jnp.abs(x[:, :, None, :] - yy[:, None, :, :]).sum(axis=3)
    if dist_norm == "l2":
        x_norm = (x**2).sum(axis=2)[:, :, None]  # (B, N, 1)
        if y is not None:
            y_norm = (y**2).sum(axis=2)[:, None, :]  # (B, 1, M)
            cross = jnp.einsum("bnd,bmd->bnm", x, y, precision="highest")
        else:
            y_norm = x_norm.transpose(0, 2, 1)
            cross = jnp.einsum("bnd,bmd->bnm", x, x, precision="highest")
        dist = x_norm + y_norm - 2.0 * cross
        if y is None:
            n = dist.shape[1]
            dist = dist * (1.0 - jnp.eye(n, dtype=dist.dtype))[None]
        return jnp.clip(dist, 0.0, None)
    raise NotImplementedError(f"{dist_norm} norm has not been supported.")
