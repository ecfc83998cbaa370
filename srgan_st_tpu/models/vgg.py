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
