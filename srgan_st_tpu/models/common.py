"""Shared model building blocks."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

# torch's nn.init.kaiming_normal_ default: fan_in, gain=sqrt(2)
# (reference model.py:130-136).
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class BatchNorm(nn.Module):
    """BatchNorm with torch running-stat semantics.

    Drop-in for flax nn.BatchNorm (same params {scale, bias} /
    batch_stats {mean, var} variable tree, same call convention) with one
    deliberate difference: the running-variance EMA accumulates the
    UNBIASED batch variance (var * n/(n-1)), matching torch BatchNorm2d.
    flax's EMA uses the biased variance; the trajectory-parity harness
    (tools/crosscheck_training_vs_reference.py) showed the conventions
    diverging measurably over training at the discriminator's small
    spatial sizes (n = B*6*6). Train-mode normalization uses the biased
    variance on both frameworks — only the EMA differs.

    `momentum` follows the flax convention (EMA keep-rate; torch
    momentum 0.1 == flax momentum 0.9). Cross-shard stat reduction via
    `axis_name` (lax.pmean) as in flax, with n scaled by the axis size so
    the unbiased correction reflects the GLOBAL element count.

    `stats_sync` (only meaningful with an `axis_name`):
      * "full" (default): normalization AND the running-stat EMA both use
        the cross-shard global batch statistics — sync-BN, matching the
        reference's single-device global-batch semantics when the batch
        is sharded.
      * "ema": normalization uses the PER-SHARD batch statistics (torch
        DistributedDataParallel's default BatchNorm behaviour), while the
        EMA still accumulates the global moments — so the replicated
        `batch_stats` stay bit-identical across shards (and identical to
        what "full" would have accumulated). The two lax.pmean
        collectives still run each train-mode forward (the EMA consumes
        the global moments), but they move OFF the differentiated path:
        the normalization no longer depends on them, so the backward
        carries no BN collectives and the forward pmeans can overlap
        compute instead of serializing it. It also lets fused kernels
        that compute stats in-VMEM (kernels/packed_trunk.py) run
        per-shard. Selected via config.TPU.LOCAL_BN."""

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype | None = None
    axis_name: str | None = None
    stats_sync: str = "full"

    @nn.compact
    def __call__(self, x):
        if self.stats_sync not in ("full", "ema"):
            raise ValueError(
                f"stats_sync={self.stats_sync!r}: expected 'full' (sync-BN) "
                "or 'ema' (per-shard normalization, global-moment EMA)"
            )
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            reduce_axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, reduce_axes)
            mean2 = jnp.mean(jnp.square(xf), reduce_axes)
            n = x.size // c
            g_mean, g_mean2, g_n = mean, mean2, n
            if self.axis_name is not None:
                g_mean, g_mean2 = lax.pmean((mean, mean2), self.axis_name)
                g_n = n * lax.axis_size(self.axis_name)
                if self.stats_sync == "full":
                    mean, mean2, n = g_mean, g_mean2, g_n
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                # the EMA always accumulates the GLOBAL moments, so with
                # stats_sync="ema" the replicated running stats still agree
                # across shards (and with the "full" path)
                g_var = jnp.maximum(g_mean2 - jnp.square(g_mean), 0.0)
                ra_mean.value = m * ra_mean.value + (1.0 - m) * g_mean
                # torch stores the UNBIASED batch variance in the EMA
                ra_var.value = m * ra_var.value + (1.0 - m) * g_var * (
                    g_n / max(g_n - 1, 1)
                )

        dtype = self.dtype or x.dtype
        y = (x.astype(dtype) - mean.astype(dtype)) * lax.rsqrt(
            var.astype(dtype) + jnp.asarray(self.epsilon, dtype)
        )
        return y * scale.astype(dtype) + bias.astype(dtype)


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


class TapConv(nn.Module):
    """SAME conv specialised for tiny output-channel counts — the
    generator's 64->3 reconstruction conv, where a direct conv wastes
    125/128 MXU lanes. Default mode runs the space-to-depth-factored
    formulation (ops/subpixel_conv.py, exact, ~1.5x on the fwd+bwd path at
    training shapes); mode="xla" forces the direct conv.
    Parameter tree is identical to nn.Conv (kernel HWIO + bias), so
    checkpoints are interchangeable."""

    features: int
    kernel_size: tuple[int, int]
    dtype: jnp.dtype = jnp.float32
    mode: str | None = None  # None=auto (subpixel f=2), "xla"
    # >0: input is the PRE-shuffle activation of a pixel_shuffle(factor)
    # that was elided by the caller (see generator.py) — run the coarse
    # conv directly on it. The kernel param keeps its (kh, kw, C, N) HR
    # shape, so checkpoints are unaffected.
    pre_shuffle_factor: int = 0
    # inner s2d factoring of the coarse conv itself (see
    # conv2d_subpixel_pre_shuffled); 1 = off, "pallas" = VMEM-relayout
    # kernel (kernels/coarse_conv.py, TPU only)
    inner_factor: int | str = 1
    # s2d factor of the default (non-pre-shuffled) mode. 2 suits the
    # 64->3 reconstruction conv at training shapes; 4 suits the 3->64
    # STEM conv at batch-1 serving shapes, where the 3-channel input
    # lanes starve the MXU (4K infer profile: ~2.7 ms/frame; committed
    # profile: ONCHIP_r05_serving.log).
    # Falls back to the direct conv when H or W isn't divisible.
    subpixel_factor: int = 2

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        f = self.pre_shuffle_factor
        in_ch = x.shape[-1] // (f * f) if f else x.shape[-1]
        kernel = self.param(
            "kernel", kaiming_normal, (kh, kw, in_ch, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        bias = bias.astype(self.dtype)
        from srgan_st_tpu.ops.subpixel_conv import (
            conv2d_subpixel,
            conv2d_subpixel_pre_shuffled,
        )

        if f:
            return conv2d_subpixel_pre_shuffled(
                x, kernel, bias, factor=f, inner_factor=self.inner_factor
            )
        factor = 1 if self.mode == "xla" else self.subpixel_factor
        return conv2d_subpixel(x, kernel, bias, factor=factor)


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
