"""SRGAN discriminator.

Exact architecture parity with reference model.py:7-71: eight 3x3 conv
layers (64-64-128-128-256-256-512-512 channels, alternating stride 1/2,
BatchNorm + LeakyReLU(0.2) on all but the first), then flatten ->
Linear(512*6*6 -> 1024) -> LeakyReLU(0.2) -> Linear(1024 -> 1). No final
sigmoid — logits out, by design. Hard-wired to 96x96 inputs (the reference
documents this as intentional, model.py:11-13). Parameter count at the
default config: 23,563,649 (model.py:194).

NHWC note: flattening is (H, W, C)-ordered rather than torch's (C, H, W) —
a fixed permutation of the first Linear layer's input, weight-count
identical; the torch-checkpoint import shim permutes accordingly.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from srgan_st_tpu.models.common import BatchNorm, kaiming_normal
from srgan_st_tpu.ops.fastgrad import StemConv3x3


class Discriminator(nn.Module):
    in_channels: int = 3
    channels: int = 64
    out_channels: int = 1
    dtype: jnp.dtype = jnp.float32
    axis_name: str | None = None
    # per-shard BN normalization stats (torch-DDP default semantics; see
    # common.BatchNorm stats_sync / config.TPU.LOCAL_BN)
    local_bn: bool = False

    @classmethod
    def from_config(cls, config, dtype=None, axis_name=None):
        return cls(
            in_channels=config.MODEL.D_IN_CHANNEL,
            channels=config.MODEL.D_N_CHANNEL,
            out_channels=config.MODEL.D_OUT_CHANNEL,
            dtype=dtype or jnp.dtype(config.TPU.COMPUTE_DTYPE),
            axis_name=axis_name,
            local_bn=bool(getattr(config.TPU, "LOCAL_BN", False)),
        )

    @nn.compact
    def __call__(self, x, train: bool = True, taps: tuple[str, ...] = ()):
        """Forward pass. With `taps` given (torch node names like
        "features.4" — the LeakyReLU outputs at torch Sequential indices
        3i+1 for conv block i), returns {tap: activation} instead of logits,
        for ContentLossDiscriminator (reference loss.py:259-266)."""
        x = x.astype(self.dtype)
        c = self.channels
        lrelu = lambda z: nn.leaky_relu(z, negative_slope=0.2)  # noqa: E731
        tap_out = {}

        def conv(z, features, stride, use_bias, name):
            return nn.Conv(
                features, (3, 3), strides=stride, padding=1, use_bias=use_bias,
                kernel_init=kaiming_normal, bias_init=nn.initializers.zeros,
                dtype=self.dtype, name=name,
            )(z)

        def bn(z, name):
            return BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, axis_name=self.axis_name if train else None,
                stats_sync="ema" if self.local_bn else "full", name=name,
            )(z)

        # features (reference model.py:30-59): (3)x96x96 -> (512)x6x6.
        # The 3->64 stem uses the packed-GEMM image-gradient backward
        # (ops/fastgrad.py): its dgrad lands on `sr` in every G step's
        # adversarial term; params/forward identical to nn.Conv.
        x = lrelu(StemConv3x3(
            c, dtype=self.dtype, kernel_init=kaiming_normal,
            bias_init=nn.initializers.zeros, name="conv0",
        )(x))
        if "features.1" in taps:
            tap_out["features.1"] = x
        specs = [  # (features, stride)
            (c, 2), (2 * c, 1), (2 * c, 2), (4 * c, 1),
            (4 * c, 2), (8 * c, 1), (8 * c, 2),
        ]
        deepest = max((int(t.split(".")[1]) for t in taps), default=-1)
        for i, (feat, stride) in enumerate(specs, start=1):
            x = conv(x, feat, stride, False, f"conv{i}")
            x = bn(x, f"bn{i}")
            x = lrelu(x)
            torch_idx = 3 * i + 1  # conv/bn/lrelu triple per block in torch Sequential
            if f"features.{torch_idx}" in taps:
                tap_out[f"features.{torch_idx}"] = x
            if taps and torch_idx >= deepest:
                return tap_out

        # classifier (reference model.py:61-65)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(1024, dtype=self.dtype, name="fc1")(x)
        x = lrelu(x)
        x = nn.Dense(self.out_channels, dtype=self.dtype, name="fc2")(x)
        return x.astype(jnp.float32)
