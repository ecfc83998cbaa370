"""VGG19 feature extractor for the perceptual content loss.

The reference uses torchvision's pretrained VGG19 (IMAGENET1K_V1) with
feature taps at Sequential indices "features.17" / "features.26" /
"features.35" (reference loss.py:46-49, config.py:60-64) — i.e. relu3_4,
relu4_4 and relu5_4. torchvision is not available at runtime here, so the
pretrained weights are ingested once with `tools/convert_vgg19.py` (torch
.pth -> npz, NCHW->HWIO kernel transposition) and loaded via
`load_vgg19_npz`.

Conv layers are named by their torch Sequential index (`conv{i}`) so taps
and weight conversion are direct.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from srgan_st_tpu.ops.fastgrad import StemConv3x3

# torchvision vgg19.features layout: Sequential index -> (kind, out_channels)
# conv indices per block; "M" = 2x2/2 max-pool. ReLU sits after every conv.
VGG19_LAYOUT: list[tuple[str, int]] = (
    [("conv", 64), ("conv", 64), ("pool", 0)]
    + [("conv", 128), ("conv", 128), ("pool", 0)]
    + [("conv", 256)] * 1 + [("conv", 256)] * 3 + [("pool", 0)]
    + [("conv", 512)] * 4 + [("pool", 0)]
    + [("conv", 512)] * 4 + [("pool", 0)]
)


def expected_torch_shapes() -> dict[str, tuple[int, ...]]:
    """Expected torchvision `features.*` tensor shapes (torch OIHW layout)
    for VGG19 IMAGENET1K_V1 — the weight-manifest ground truth
    (weights/vgg19_imagenet.MANIFEST.json is generated from this)."""
    shapes: dict[str, tuple[int, ...]] = {}
    cin = 3
    for idx, kind, cout in _torch_indices():
        if kind != "conv":
            continue
        shapes[f"features.{idx}.weight"] = (cout, cin, 3, 3)
        shapes[f"features.{idx}.bias"] = (cout,)
        cin = cout
    return shapes


def _torch_indices() -> list[tuple[int, str, int]]:
    """Yield (torch_sequential_index, kind, channels) for conv/pool entries,
    accounting for the interleaved ReLU modules."""
    out = []
    idx = 0
    for kind, ch in VGG19_LAYOUT:
        out.append((idx, kind, ch))
        idx += 2 if kind == "conv" else 1  # conv is followed by its ReLU
    return out


class VGG19Features(nn.Module):
    """Runs vgg19.features up to the deepest requested tap and returns
    {tap_name: activation}. Tap names are torch node names ("features.17"
    refers to the output of the ReLU at Sequential index 17)."""

    taps: tuple[str, ...]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        wanted = {int(t.split(".")[1]) for t in self.taps}
        deepest = max(wanted)
        outputs = {}
        for idx, kind, ch in _torch_indices():
            if kind == "conv":
                if idx == 0:
                    # 3->64 stem: same params/forward as nn.Conv, but the
                    # image-space dgrad (the costliest op of the perceptual
                    # loss backward) runs as a packed GEMM (ops/fastgrad.py)
                    x = StemConv3x3(ch, dtype=self.dtype, name=f"conv{idx}")(x)
                else:
                    x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                                name=f"conv{idx}")(x)
                x = nn.relu(x)
                relu_idx = idx + 1
                if relu_idx in wanted:
                    outputs[f"features.{relu_idx}"] = x
                if relu_idx >= deepest:
                    break
            else:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                if idx in wanted:
                    outputs[f"features.{idx}"] = x
                if idx >= deepest:
                    break
        return outputs


def make_vgg19_frozen_pair(variables: dict, taps: tuple[str, ...], dtype):
    """Build `pair(sr_n, gt_n) -> (feats_sr, feats_gt)` — ONE forward over
    the batch-concatenated pair with a hand-written backward that traverses
    only the sr half.

    Why: the perceptual loss runs VGG three times per step (sr fwd, gt fwd,
    sr bwd). The gt branch carries no gradient (gt is data; the VGG weights
    are frozen by construction, reference loss.py:50-52 `requires_grad_(
    False)`), yet autodiff of two separate batch-B forwards leaves the gt
    forward's ops at half the batch size and doubles the op count. Here the
    two forwards fuse into batch-2B ops, residuals save only the sr half,
    and the backward is written out layer-by-layer: relu masks, max-pool
    vjps, conv input-gradients via the kernel-transpose identity, and the
    3->64 stem's packed-GEMM image gradient (ops/fastgrad.py).

    MEASURED on v5e (2026-08-19, ONCHIP_r03.log): the pair path LOST its
    A/B — 2,642 vs 2,680 patches/s/chip in the full gram-vgg step (the
    VGG convs already run near-peak MFU at batch 16, so halving op count
    buys less than the pair's extra concat/split traffic costs). It is
    therefore OPT-IN (spec["pair"]=True), kept for memory-bound configs
    where saving the gt-branch residuals matters.

    FROZEN-PAIR CONTRACT: gradients flow ONLY to `sr_n`. The returned
    cotangents for `gt_n` are zero and the VGG parameters (closed over as
    constants) receive none — exactly the reference's semantics, where VGG
    is a frozen feature extractor and gt enters the loss as data. Do not
    reuse this for a fine-tuned extractor.

    relu'(0) note: the mask credits strictly-positive activations (torch
    semantics); jax's `maximum` autodiff gives 0.5 at exactly 0 — a
    measure-zero input set for float activations.
    """
    import jax

    from srgan_st_tpu.ops.fastgrad import _conv3x3_same, stem_image_grad

    deepest = max(int(t.split(".")[1]) for t in taps)
    params = variables["params"]
    convs = {}
    for idx, kind, _ in _torch_indices():
        if kind == "conv" and idx <= deepest:
            convs[idx] = (
                jnp.asarray(params[f"conv{idx}"]["kernel"], dtype),
                jnp.asarray(params[f"conv{idx}"]["bias"], dtype),
            )

    def _conv(x, idx):
        w, bias = convs[idx]
        return _conv3x3_same(x, w, bias)

    def _dgrad(ct, idx):
        # input gradient of a SAME 3x3/s1 conv == conv with the spatially
        # flipped, in/out-transposed kernel
        w, _ = convs[idx]
        if w.shape[2] <= 8:  # the 3->64 stem: packed-GEMM formulation
            return stem_image_grad(ct, w)
        return _conv3x3_same(ct, w[::-1, ::-1].swapaxes(2, 3), None)

    def _run(x, b):
        """Shared forward walk; returns (sr_feats, gt_feats, residuals) with
        residuals = post-relu sr halves per conv layer (the relu masks and
        pool inputs the backward needs)."""
        feats_sr, feats_gt, res = {}, {}, {}
        for idx, kind, _ in _torch_indices():
            if kind == "conv":
                x = jax.nn.relu(_conv(x, idx))
                res[idx] = x[:b]
                relu_idx = idx + 1
                if f"features.{relu_idx}" in taps:
                    feats_sr[f"features.{relu_idx}"] = x[:b]
                    feats_gt[f"features.{relu_idx}"] = x[b:]
                if relu_idx >= deepest:
                    break
            else:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                if f"features.{idx}" in taps:
                    feats_sr[f"features.{idx}"] = x[:b]
                    feats_gt[f"features.{idx}"] = x[b:]
                if idx >= deepest:
                    break
        return feats_sr, feats_gt, res

    @jax.custom_vjp
    def pair(sr_n, gt_n):
        x = jnp.concatenate([sr_n, gt_n], axis=0).astype(dtype)
        feats_sr, feats_gt, _ = _run(x, sr_n.shape[0])
        return feats_sr, feats_gt

    def pair_fwd(sr_n, gt_n):
        x = jnp.concatenate([sr_n, gt_n], axis=0).astype(dtype)
        feats_sr, feats_gt, res = _run(x, sr_n.shape[0])
        # gt_n is carried only for its shape/dtype (the zero cotangent
        # below); its value is unused, so XLA dead-code-eliminates the
        # buffer — no extra residual memory
        return (feats_sr, feats_gt), (res, sr_n, gt_n)

    def pair_bwd(residuals, cts):
        res, sr_n, gt_n = residuals
        ct_sr, _ct_gt_ignored = cts  # frozen-pair contract: gt carries none
        plan = [(idx, kind) for idx, kind, _ in _torch_indices()
                if idx <= deepest]
        ct = None
        for idx, kind in reversed(plan):
            if kind == "conv":
                relu_idx = idx + 1
                tap = ct_sr.get(f"features.{relu_idx}")
                if tap is not None:
                    ct = tap if ct is None else ct + tap
                ct = jnp.where(res[idx] > 0, ct, 0)  # relu mask
                ct = _dgrad(ct, idx)
            else:
                tap = ct_sr.get(f"features.{idx}")
                if tap is not None:
                    ct = tap if ct is None else ct + tap
                if ct is not None:
                    # pool input == the previous conv's saved post-relu
                    prev = max(i for i, k in plan if k == "conv" and i < idx)
                    _, pvjp = jax.vjp(
                        lambda z: nn.max_pool(z, (2, 2), strides=(2, 2)),
                        res[prev],
                    )
                    (ct,) = pvjp(ct)
        dsr = ct.astype(sr_n.dtype)
        return dsr, jnp.zeros_like(gt_n)

    pair.defvjp(pair_fwd, pair_bwd)
    return pair


def load_vgg19_npz(path: str, taps: tuple[str, ...]) -> dict:
    """Load converted torchvision VGG19 weights (see tools/convert_vgg19.py)
    into a flax params tree for VGG19Features, keeping only the layers the
    taps need."""
    deepest = max(int(t.split(".")[1]) for t in taps)
    data = np.load(path)
    expected = expected_torch_shapes()
    params = {}
    for idx, kind, _ in _torch_indices():
        if kind != "conv" or idx > deepest:
            continue
        wk, bk = f"features.{idx}.weight", f"features.{idx}.bias"
        if wk not in data or bk not in data:
            raise ValueError(
                f"{path} is missing {wk}/{bk} — not a VGG19 weight archive "
                f"deep enough for taps {taps}? Regenerate with "
                f"tools/convert_vgg19.py"
            )
        o, i, kh, kw = expected[wk]
        if data[wk].shape != (kh, kw, i, o):  # converter stores HWIO
            raise ValueError(
                f"{path}: {wk} has shape {data[wk].shape}, expected HWIO "
                f"{(kh, kw, i, o)} (torchvision VGG19 IMAGENET1K_V1 layout; "
                f"see weights/vgg19_imagenet.MANIFEST.json)"
            )
        params[f"conv{idx}"] = {
            "kernel": jnp.asarray(data[wk]),
            "bias": jnp.asarray(data[bk]),
        }
    return {"params": params}
