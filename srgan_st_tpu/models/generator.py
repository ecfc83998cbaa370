"""SRResNet generator (the SRGAN paper generator).

Architecture parity with reference model.py:74-184: 9x9 conv + PReLU head,
`G_N_RCB` residual conv blocks (conv3x3-BN-PReLU-conv3x3-BN + identity), a
3x3 conv + BN fusion layer, global skip-add back to the head activations,
log2(upscale) sub-pixel upsample blocks (conv3x3 to channels*r^2 +
pixel-shuffle + PReLU), a 9x9 reconstruction conv, and a final clamp to
[0, 1]. Kaiming-normal conv init, zero bias, BN scale 1 (model.py:130-136).
Parameter count at the default config: 1,547,350 (model.py:193).

TPU-native differences:
  * NHWC layout; pixel-shuffle is a reshape/transpose XLA fuses into the
    convolutions.
  * BatchNorm uses flax BatchNorm with an optional `axis_name` so batch
    statistics are computed across the data mesh axis (sync-BN semantics —
    matches the reference's single-device global-batch statistics when the
    batch is sharded; SURVEY.md §7 "hard parts").
  * the x3 upsample path is correct here (conv to channels*9 + depth-to-
    space(3)); the reference's is latently broken (model.py:159-160
    hard-codes PixelShuffle(2) while the conv emits r^2 channels).
  * optional bfloat16 compute dtype and remat of the trunk.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import flax.linen as nn

from srgan_st_tpu.models.common import (
    BatchNorm, PReLU, TapConv, kaiming_normal, pixel_shuffle,
)


class ResidualConvBlock(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32
    axis_name: str | None = None
    local_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        conv = lambda name: nn.Conv(  # noqa: E731
            self.channels, (3, 3), padding=1, use_bias=False,
            kernel_init=kaiming_normal, dtype=self.dtype, name=name,
        )
        bn = lambda name: BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, axis_name=self.axis_name if train else None,
            stats_sync="ema" if self.local_bn else "full", name=name,
        )
        x = conv("conv1")(x)
        x = bn("bn1")(x)
        x = PReLU(name="prelu")(x)
        x = conv("conv2")(x)
        x = bn("bn2")(x)
        return x + identity


class UpsampleBlock(nn.Module):
    channels: int
    upscale_factor: int
    dtype: jnp.dtype = jnp.float32
    # skip the pixel_shuffle and return the PRE-shuffle activation — exact
    # when the consumer elides its matching space-to-depth (TapConv
    # pre_shuffle_factor). PReLU's single shared slope commutes with the
    # shuffle, so applying it pre-shuffle is the identical function.
    fuse_shuffle: bool = False

    @nn.compact
    def __call__(self, x):
        r = self.upscale_factor
        x = nn.Conv(
            self.channels * r * r, (3, 3), padding=1,
            kernel_init=kaiming_normal, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="conv",
        )(x)
        # PReLU applied pre-shuffle: its single shared slope commutes with
        # the shuffle (identical function, torch applies it post-shuffle)
        # and keeps the activation in the conv's natural layout.
        x = PReLU(name="prelu")(x)
        if not self.fuse_shuffle:
            x = pixel_shuffle(x, r)
        return x


class Generator(nn.Module):
    """SRResNet. Input NHWC in [0, 1]; output NHWC in [0, 1]."""

    in_channels: int = 3
    out_channels: int = 3
    channels: int = 64
    num_rcb: int = 16
    upscale: int = 4
    dtype: jnp.dtype = jnp.float32
    axis_name: str | None = None
    # per-shard BN normalization stats under shard_map (torch-DDP default
    # semantics; running stats still accumulate global moments — see
    # common.BatchNorm stats_sync). Required for the packed trunk kernel
    # on multi-chip meshes. config.TPU.LOCAL_BN.
    local_bn: bool = False
    remat: bool = False
    conv3_mode: str | None = None  # None=fused, "s2d", "xla"
    # inner s2d factoring of the fused coarse conv: None (default) =
    # auto — the VMEM-relayout Pallas kernel (kernels/coarse_conv.py,
    # measured -0.12 ms/step) when it is GSPMD-safe (single device, or
    # explicit-SPMD via axis_name so the kernel runs per-shard; a GSPMD
    # multi-chip mesh would all-gather custom-call operands), else the
    # plain XLA coarse conv. Auto/"pallas" engage the ONE-BLOCK
    # (training-scale) kernel only; at serving sizes they fall back to
    # the XLA coarse conv (the H-tiled kernel is a measured 2.3x
    # end-to-end loss at 4K — layout poisoning around the custom call,
    # ONCHIP_r05_serving.log — and is opt-in via "pallas-tiled").
    # 1/2 force the XLA paths.
    conv3_inner: int | str | None = None
    # trunk execution: None=auto (see _trunk_mode), or force one of
    # "unfused" (flax blocks), "xpack" (W-parity lane packing as pure
    # XLA convs, kernels/xpack_trunk.py — the measured on-chip winner
    # and the bf16-train auto default), "fused" (whole-trunk Pallas fwd,
    # kernels/fused_trunk.py), "packed" (lane-packed Pallas fwd+bwd,
    # kernels/packed_trunk.py), "hybrid" (XLA fwd + packed Pallas bwd —
    # each direction's microbench winner, loses end-to-end), or a
    # "*_interpret" variant. The parameter/batch-stat TREE is identical
    # in every mode (the kernel paths read the per-RCB subtrees and
    # stack them). Eval auto runs unfused (measured serving winner);
    # an explicit "xpack" opts eval into the BN-folded xpack_trunk_eval.
    trunk_mode: str | None = None
    # conv1 stem formulation: None = direct conv (bit-exact reference
    # path, right for training where the batch fills the MXU), "s2d" =
    # space-to-depth(4)-factored conv (ops/subpixel_conv.py) for batch-1
    # serving, where the 3-channel input starves the implicit GEMM (4K
    # infer profile: 2.7 of 68 ms/frame; its end-to-end A/B LOST — 130.9
    # vs 69.2 ms/frame, ONCHIP_r05_serving.log §4 — so it stays opt-in).
    # Param tree is nn.Conv-compatible either way (TapConv).
    stem_mode: str | None = None
    # serving tail: None = the composed path (last upsample block +
    # TapConv conv3), "fused" = the single H-tiled Pallas kernel
    # (kernels/serving_tail.py: up-conv + PReLU + doubly-coarse conv3,
    # the 256-channel pre-shuffle activation never touches HBM).
    # Eval-only; shape-gated with a safe fallback to the composed path.
    # Param tree is identical (the kernel reads the up/conv3 subtrees).
    tail_mode: str | None = None

    @classmethod
    def from_config(cls, config, dtype=None, axis_name=None):
        return cls(
            in_channels=config.MODEL.G_IN_CHANNEL,
            out_channels=config.MODEL.G_OUT_CHANNEL,
            channels=config.MODEL.G_N_CHANNEL,
            num_rcb=config.MODEL.G_N_RCB,
            upscale=config.DATA.UPSCALE_FACTOR,
            dtype=dtype or jnp.dtype(config.TPU.COMPUTE_DTYPE),
            axis_name=axis_name,
            local_bn=bool(getattr(config.TPU, "LOCAL_BN", False)),
            remat=config.TPU.REMAT,
            trunk_mode=getattr(config.TPU, "TRUNK_MODE", None),
            stem_mode=getattr(config.TPU, "STEM_MODE", None),
            conv3_inner=getattr(config.TPU, "CONV3_INNER", None),
            tail_mode=getattr(config.TPU, "TAIL_MODE", None),
        )

    def _packed_ok(self, x) -> bool:
        """Semantics gate for the lane-packed trunk (kernels/
        packed_trunk.py): bf16 train steps; per-shard batch stats — i.e.
        single device, or the explicit-SPMD shard_map path with LOCAL_BN
        (the kernel normalizes with stats it computes in-VMEM; sync-BN
        needs the unfused path's cross-shard mean). GSPMD multi-chip is
        excluded: Pallas custom calls are opaque to sharding propagation.
        Plus shape gates: even fine width, C a multiple of 64 (full lane
        packing), and a VMEM-sized activation block."""
        import jax

        if self.dtype != jnp.bfloat16:
            return False
        if self.axis_name is not None:
            if not self.local_bn:
                return False  # sync-BN semantics need the unfused path
        elif jax.device_count() != 1:
            return False
        b, h, w, c = x.shape
        if w % 2 or c % 64 or c < 64:
            return False
        # per-block VMEM residency: ~6 (b, h+2, wp, 2c) bf16 buffers live
        # across fwd+bwd scratch + streamed blocks; cap well under 128 MB
        wp = -(-(w // 2 + 1) // 16) * 16
        block_bytes = b * (h + 2) * wp * 2 * c * 2
        return 8 * block_bytes <= 96 * 1024 * 1024

    def _trunk_mode(self, train: bool, x=None) -> str:
        """Resolve the trunk execution path (see `trunk_mode`).

        Auto resolves to XPACK (kernels/xpack_trunk.py — the W-parity
        lane packing as pure-XLA convs) for bf16 training steps: measured
        ON-CHIP WINNER at the headline config, 5,806 vs 5,191 patches/s/
        chip vs the unfused path (2026-08-19, ONCHIP_r4a/BENCH_SUITE.md).
        f32 steps stay UNFUSED — the strict-parity configuration every
        trajectory golden was pinned on; xpack's conv accumulation order
        differs (within fp tolerance, but unfused is the
        closest-to-reference path and f32 is not the perf target).

        The Pallas alternatives remain opt-in, all measured slower:
        "packed" (5,043 — the per-step weight-pack/wgrad-unpack ops eat
        the kernel's win), "hybrid" (3,974 — fine->packed residual
        relayouts), "fused" (983 vs 353 us/step forward — Mosaic lowers
        the batched dots as per-row matmuls)."""
        if self.trunk_mode is not None:
            if train and self.trunk_mode == "xpack_eval":
                # xpack_eval is the BN-folded running-stat trunk — reaching
                # it from a training step would silently train with frozen
                # normalization and no batch-stat EMA. Eval opts into it
                # via trunk_mode="xpack" (see _trunk's eval branch).
                raise ValueError(
                    "trunk_mode='xpack_eval' is an eval-only formulation; "
                    "use trunk_mode='xpack' (eval resolves it to the "
                    "BN-folded eval trunk automatically)"
                )
            return self.trunk_mode
        if self.dtype == jnp.bfloat16:
            return "xpack"
        return "unfused"

    def _trunk(self, x, train: bool):
        """The 16-RCB trunk: fused Pallas kernel or per-block flax modules,
        with an IDENTICAL variable tree (the fused path reads/writes the
        per-RCB subtrees directly via the module scope)."""
        mode = self._trunk_mode(train, x)
        if not train:
            # eval: auto runs UNFUSED — measured serving winner (xpack_eval
            # lost its on-chip A/B at the 4K shape, 76.4 vs 69.2 ms/frame:
            # at batch-1 whole-image sizes the pack relayout + masks cost
            # more than the lane gain, ONCHIP_r05_serving.log §4). An EXPLICIT
            # trunk_mode="xpack" opts eval into xpack_trunk_eval (BN folded
            # into the packed conv weights); the Pallas trunks compute
            # batch stats in-VMEM and have no eval mode at all.
            explicit_xpack = self.trunk_mode is not None and (
                self.trunk_mode.startswith("xpack"))
            mode = "xpack_eval" if explicit_xpack else "unfused"
        from srgan_st_tpu.ops.subpixel_conv import _concrete_pred

        if (mode.startswith("xpack")
                and not _concrete_pred(lambda: x.shape[2] % 2 == 0)):
            mode = "unfused"  # the W-parity pack needs an even fine width
            # (symbolic widths — jax.export shape polymorphism — fall back
            # to the shape-agnostic unfused trunk)
        if (mode != "unfused" and not mode.startswith("xpack")
                and self.axis_name is not None and not self.local_bn):
            # both Pallas trunks compute BN stats in-VMEM (per shard);
            # under shard_map with sync-BN that silently changes the
            # normalization semantics. Auto falls back; an explicitly
            # forced kernel mode is an error rather than a silent change.
            if self.trunk_mode is not None:
                raise ValueError(
                    f"trunk_mode={mode!r} computes per-shard batch stats "
                    "in-kernel; with an axis_name it requires "
                    "TPU.LOCAL_BN=True (per-shard normalization, "
                    "global-moment EMA) or trunk_mode='unfused'"
                )
            mode = "unfused"
        if mode in ("packed", "hybrid") and not self._packed_ok(x):
            mode = "unfused"  # out-of-gate shapes/meshes fall back safely
        rcb0 = self.scope.get_variable("params", "rcb0")
        if mode == "unfused" or self.is_initializing() or rcb0 is None:
            block = ResidualConvBlock
            if self.remat:
                block = nn.remat(ResidualConvBlock, static_argnums=(2,))
            for i in range(self.num_rcb):
                x = block(
                    self.channels, dtype=self.dtype, axis_name=self.axis_name,
                    local_bn=self.local_bn, name=f"rcb{i}",
                )(x, train)
            return x

        from srgan_st_tpu.kernels.fused_trunk import (
            fused_trunk,
            stack_rcb_params,
        )

        rcb_params = [
            self.scope.get_variable("params", f"rcb{i}")
            for i in range(self.num_rcb)
        ]
        operands = stack_rcb_params(rcb_params)
        if mode == "xpack_eval":
            from srgan_st_tpu.kernels.xpack_trunk import xpack_trunk_eval

            rcb_stats = [
                self.scope.get_variable("batch_stats", f"rcb{i}")
                for i in range(self.num_rcb)
            ]
            m1s = jnp.stack([s["bn1"]["mean"] for s in rcb_stats])
            v1s = jnp.stack([s["bn1"]["var"] for s in rcb_stats])
            m2s = jnp.stack([s["bn2"]["mean"] for s in rcb_stats])
            v2s = jnp.stack([s["bn2"]["var"] for s in rcb_stats])
            return xpack_trunk_eval(x, *operands, m1s, v1s, m2s, v2s, 1e-5)
        if mode.startswith("xpack"):
            from srgan_st_tpu.kernels.xpack_trunk import xpack_trunk

            y, stats = xpack_trunk(
                x, *operands, 1e-5,
                axis_name=self.axis_name, local_bn=self.local_bn,
            )
        elif mode.startswith("packed") or mode.startswith("hybrid"):
            from srgan_st_tpu.kernels.packed_trunk import (
                hybrid_trunk,
                packed_trunk,
            )

            fn = hybrid_trunk if mode.startswith("hybrid") else packed_trunk
            y, stats = fn(x, *operands, 1e-5, mode.endswith("_interpret"))
        else:
            y, stats = fused_trunk(
                x, *operands, 1e-5, mode == "fused_interpret"
            )
        # torch-faithful running-stat EMA (common.BatchNorm): unbiased
        # batch variance; stats (N, 4, C) = [m1, v1, m2, v2] per block
        if train and self.is_mutable_collection("batch_stats"):
            nelem = x.size // x.shape[-1]
            if self.axis_name is not None:
                # packed under shard_map (LOCAL_BN): normalization used the
                # per-shard stats the kernel computed, but the EMA
                # accumulates GLOBAL moments (common.BatchNorm
                # stats_sync="ema") so replicated batch_stats stay
                # identical across shards
                from jax import lax

                means = stats[:, (0, 2)]
                gm = lax.pmean(means, self.axis_name)
                gm2 = lax.pmean(stats[:, (1, 3)] + means * means, self.axis_name)
                gv = jnp.maximum(gm2 - gm * gm, 0.0)
                stats = jnp.stack(
                    [gm[:, 0], gv[:, 0], gm[:, 1], gv[:, 1]], axis=1
                )
                nelem = nelem * lax.axis_size(self.axis_name)
            corr = nelem / max(nelem - 1, 1)
            m = 0.9
            for i in range(self.num_rcb):
                old = self.scope.get_variable("batch_stats", f"rcb{i}")
                new = {
                    "bn1": {
                        "mean": m * old["bn1"]["mean"] + 0.1 * stats[i, 0],
                        "var": m * old["bn1"]["var"] + 0.1 * stats[i, 1] * corr,
                    },
                    "bn2": {
                        "mean": m * old["bn2"]["mean"] + 0.1 * stats[i, 2],
                        "var": m * old["bn2"]["var"] + 0.1 * stats[i, 3] * corr,
                    },
                }
                self.scope.put_variable("batch_stats", f"rcb{i}", new)
        return y

    def _use_fused_tail(self, x, r, train, fuse) -> bool:
        """Dispatch gate for the fused serving tail (kernels/
        serving_tail.py): explicit eval-only opt-in (tail_mode="fused"),
        the conv3 fusion active (the kernel consumes the pre-shuffle
        activation), a x2 last block, concrete even dims inside the
        kernel's VMEM feasibility envelope (serving_tail.fits_budget —
        the single source of truth), and live params (init runs the
        composed modules so the variable tree is identical)."""
        if self.tail_mode != "fused" or train or not fuse or r != 2:
            return False
        if self.is_initializing():
            return False
        if self.scope.get_variable("params", f"up{len(self._up_factors()) - 1}"
                                   ) is None:
            return False
        from srgan_st_tpu.kernels.serving_tail import fits_budget
        from srgan_st_tpu.ops.subpixel_conv import _concrete_pred

        return _concrete_pred(lambda: fits_budget(
            x.shape[1], x.shape[2], x.shape[3],
            self.channels * 4, self.out_channels,
        ))

    def _up_factors(self):
        if self.upscale in (2, 4, 8):
            return [2] * int(math.log2(self.upscale))
        if self.upscale == 3:
            return [3]
        raise ValueError(f"unsupported upscale factor {self.upscale}")

    def _fused_tail(self, x, i):
        """Run the fused tail kernel on the composed path's own params
        (identical variable tree; checkpoints unaffected)."""
        import jax

        from srgan_st_tpu.kernels.serving_tail import serving_tail

        # (an optimization_barrier on x was A/B'd against the upstream
        # T(2,128) layout poisoning: no effect — it fences fusion, not
        # layout assignment; 84.3 vs 85.0 ms/frame with the bf16 output
        # change in the same run, ONCHIP_r05_tail.log)
        up = self.scope.get_variable("params", f"up{i}")
        c3 = self.scope.get_variable("params", "conv3")
        out = serving_tail(
            x, up["conv"]["kernel"], up["conv"]["bias"],
            up["prelu"]["alpha"], c3["kernel"], c3["bias"],
            interpret=jax.default_backend() != "tpu",
        )
        return jnp.clip(out.astype(jnp.float32), 0.0, 1.0)

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)

        # Low-frequency information extraction layer (model.py:100-103)
        if self.stem_mode == "s2d":
            x = TapConv(
                self.channels, (9, 9), dtype=self.dtype,
                subpixel_factor=4, name="conv1",
            )(x)
        else:
            x = nn.Conv(
                self.channels, (9, 9), padding=4, kernel_init=kaiming_normal,
                bias_init=nn.initializers.zeros, dtype=self.dtype,
                name="conv1",
            )(x)
        conv1 = PReLU(name="prelu1")(x)

        # High-frequency trunk (model.py:106-109)
        x = self._trunk(conv1, train)

        # Linear fusion layer + global skip (model.py:112-115, 143-146)
        x = nn.Conv(
            self.channels, (3, 3), padding=1, use_bias=False,
            kernel_init=kaiming_normal, dtype=self.dtype, name="conv2",
        )(x)
        x = BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, axis_name=self.axis_name if train else None,
            stats_sync="ema" if self.local_bn else "full", name="bn2",
        )(x)
        x = x + conv1

        # Sub-pixel zoom blocks (model.py:118-124)
        factors = self._up_factors()
        # conv3_mode None (default): the LAST block's pixel-shuffle and the
        # reconstruction conv's space-to-depth are exact channel-layout
        # inverses (ops/subpixel_conv.py conv2d_subpixel_pre_shuffled), so
        # both are elided — the full-HR activation and its layout copies
        # (~0.35 ms of the 3.6 ms step) never materialize. Exact.
        fuse = self.conv3_mode is None
        for i, r in enumerate(factors):
            last = i == len(factors) - 1
            if last and self._use_fused_tail(x, r, train, fuse):
                return self._fused_tail(x, i)
            x = UpsampleBlock(
                self.channels, r, dtype=self.dtype,
                fuse_shuffle=fuse and last, name=f"up{i}",
            )(x)

        # Reconstruction (model.py:127) + clamp (model.py:150). The 64->3
        # conv as a direct conv uses 3/128 MXU lanes (the profiled hot spot
        # of GAN training, ~2 ms of a 5.6 ms step); conv3_mode: None=fused
        # coarse conv on the pre-shuffle activations, "s2d"=standalone
        # space-to-depth factored conv, "xla"=direct conv.
        inner = self.conv3_inner
        if inner is None:  # auto: Pallas only where it stays per-shard
            import jax

            gspmd_safe = self.axis_name is not None or jax.device_count() == 1
            inner = "pallas" if gspmd_safe else 1
        x = TapConv(
            self.out_channels, (9, 9), dtype=self.dtype,
            mode=self.conv3_mode,
            pre_shuffle_factor=factors[-1] if fuse else 0,
            inner_factor=inner,
            name="conv3",
        )(x)
        return jnp.clip(x.astype(jnp.float32), 0.0, 1.0)
