"""Fused best-buddy selection as a Pallas TPU kernel.

Computes, per batch element,

    sel[n] = bank[argmin_m  alpha*||p1[n]-bank[m]||^2 + beta*||p2[n]-bank[m]||^2]

— the shared machinery of BestBuddy / Gram / PatchwiseST losses (reference
loss.py:132-137: two batch_pairwise_distance calls + torch.min + gather).

Fusion rationale: the XLA path materializes two (B, N, M) score tensors in
HBM (~88 MB each at the training shapes) before reducing them to N indices.
Here the entire working set lives in VMEM per batch element (bank ~145 KB,
patches ~110 KB, scores ~5.5 MB), the two distance computations ride the
MXU as (N, d) @ (d, M) contractions, and the gather is a one-hot (N, M) @
(M, d) matmul — nothing but the (N, d) selection ever touches HBM.

The selection is gradient-free by construction (argmin has no gradient and
the bank derives from ground truth, so the reference's gather backward is
dead code — see losses/functions.py); the wrapper stops gradients
explicitly, keeping the kernel forward-only.

MEASURED (round 2, v5e single chip, `bench.py --suite`): in the full
flagship GAN step (Adv+Pixel+PatchwiseST+ContentDisc, batch 16) the
kernel is throughput-NEUTRAL vs the XLA path — 3515 vs 3522 patches/s/chip
(within run noise). XLA evidently keeps its score tensors fused well
enough at these shapes. The kernel stays the TPU default for its bounded
VMEM working set (no (B, N, M) HBM intermediates by construction), but it
is not a speed win at training shapes; `pallas=False` on the buddy losses
forces the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _buddy_kernel(p1_ref, p2_ref, bank_ref, out_ref, *, alpha, beta, dist_norm):
    p1 = p1_ref[0]  # (N, d)
    p2 = p2_ref[0]
    bank = bank_ref[0]  # (M, d)
    n = p1.shape[0]
    m = bank.shape[0]

    if dist_norm == "l2":
        bank_norm = jnp.sum(bank * bank, axis=1)[None, :]  # (1, M)

        def l2(p):
            p_norm = jnp.sum(p * p, axis=1)[:, None]  # (N, 1)
            cross = jnp.dot(p, bank.T, preferred_element_type=jnp.float32)
            return jnp.clip(p_norm + bank_norm - 2.0 * cross, 0.0, None)

        score = alpha * l2(p1) + beta * l2(p2)
    elif dist_norm == "l1":
        # L1 has no matmul form; broadcast in VMEM (small d keeps this cheap)
        s1 = jnp.abs(p1[:, None, :] - bank[None, :, :]).sum(axis=2)
        s2 = jnp.abs(p2[:, None, :] - bank[None, :, :]).sum(axis=2)
        score = alpha * s1 + beta * s2
    else:
        raise NotImplementedError(dist_norm)

    ind = jnp.argmin(score, axis=1)  # (N,)
    # gather-as-matmul: one_hot(ind) @ bank stays on the MXU
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, m), dimension=1)
    onehot = (cols == ind[:, None]).astype(bank.dtype)
    out_ref[0] = jnp.dot(onehot, bank, preferred_element_type=jnp.float32).astype(
        out_ref.dtype
    )


def buddy_select(
    p1: jnp.ndarray,
    p2: jnp.ndarray,
    bank: jnp.ndarray,
    alpha: float = 1.0,
    beta: float = 1.0,
    dist_norm: str = "l2",
    interpret: bool = False,
) -> jnp.ndarray:
    """p1, p2: (B, N, d); bank: (B, M, d) -> selected (B, N, d).

    Equivalent to the XLA path in losses/functions._buddy_select; gradients
    are stopped (the selection is inherently gradient-free)."""
    p1 = jax.lax.stop_gradient(p1)
    p2 = jax.lax.stop_gradient(p2)
    bank = jax.lax.stop_gradient(bank)
    b, n, d = p1.shape

    kernel = functools.partial(
        _buddy_kernel, alpha=alpha, beta=beta, dist_norm=dist_norm
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, bank.shape[1], d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), p1.dtype),
        interpret=interpret,
    )(p1, p2, bank)
