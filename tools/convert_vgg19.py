"""One-time VGG19 weight ingestion (SURVEY.md §7 "hard parts").

Converts a torchvision VGG19 checkpoint (IMAGENET1K_V1,
https://download.pytorch.org/models/vgg19-dcbb9e9d.pth) into the npz format
`srgan_st_tpu.models.vgg.load_vgg19_npz` consumes: conv kernels transposed
from torch OIHW to flax HWIO, keys kept as "features.{i}.weight/bias".
torchvision itself is NOT required — only torch (CPU) to unpickle.

Usage:
    python tools/convert_vgg19.py --pth vgg19-dcbb9e9d.pth \
        --out weights/vgg19_imagenet.npz
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def convert(pth_path: str, out_path: str) -> None:
    import torch

    state = torch.load(pth_path, map_location="cpu", weights_only=True)
    out = {}
    for key, tensor in state.items():
        if not key.startswith("features."):
            continue  # classifier head unused by the content loss
        arr = tensor.numpy()
        if key.endswith(".weight") and arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        out[key] = arr
    if not out:
        raise ValueError(f"no features.* keys in {pth_path} — not a VGG state dict?")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, **out)
    print(f"wrote {len(out)} arrays to {out_path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--pth", required=True, help="torchvision vgg19 .pth checkpoint")
    p.add_argument("--out", default="weights/vgg19_imagenet.npz")
    args = p.parse_args()
    convert(args.pth, args.out)
