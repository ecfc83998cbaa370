"""One-time VGG19 weight ingestion (SURVEY.md §7 "hard parts").

Converts a torchvision VGG19 checkpoint (IMAGENET1K_V1,
https://download.pytorch.org/models/vgg19-dcbb9e9d.pth) into the npz format
`srgan_st_tpu.models.vgg.load_vgg19_npz` consumes: conv kernels transposed
from torch OIHW to flax HWIO, keys kept as "features.{i}.weight/bias".
torchvision itself is NOT required — only torch (CPU) to unpickle.

The candidate .pth is verified against weights/vgg19_imagenet.MANIFEST.json
(per-tensor OIHW shapes + dtype, derived from the published torchvision
architecture, plus the archive's sha256 prefix — torch's download
convention embeds the first 8 sha256 hex chars in the filename,
vgg19-dcbb9e9d.pth). Pass --no-hash-check for a differently-serialized but
shape-identical artifact; shape verification always runs.

Usage:
    python tools/convert_vgg19.py --pth vgg19-dcbb9e9d.pth \
        --out weights/vgg19_imagenet.npz
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_MANIFEST = os.path.join(_REPO, "weights", "vgg19_imagenet.MANIFEST.json")


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def verify_against_manifest(state: dict, manifest_path: str,
                            pth_path: str | None = None,
                            check_hash: bool = True) -> None:
    """Raise ValueError with an actionable message if `state` (a torch
    state dict) does not match the IMAGENET1K_V1 manifest."""
    with open(manifest_path) as f:
        manifest = json.load(f)
    if check_hash and pth_path is not None:
        prefix = manifest["pth_sha256_prefix"]
        got = _sha256(pth_path)
        if not got.startswith(prefix):
            raise ValueError(
                f"{pth_path}: sha256 {got[:16]}... does not start with the "
                f"IMAGENET1K_V1 prefix '{prefix}' (expected the torchvision "
                f"artifact {manifest['url']}). If this is an intentionally "
                f"different serialization of the same weights, re-run with "
                f"--no-hash-check; shapes will still be verified."
            )
    problems = []
    for key, shape in manifest["tensors_oihw"].items():
        if key not in state:
            problems.append(f"missing tensor {key}")
            continue
        arr = state[key]
        got_shape = tuple(arr.shape)
        if got_shape != tuple(shape):
            problems.append(f"{key}: shape {got_shape}, expected {tuple(shape)}")
        if str(arr.dtype).removeprefix("torch.") != manifest["dtype"]:
            problems.append(f"{key}: dtype {arr.dtype}, expected {manifest['dtype']}")
    if problems:
        raise ValueError(
            f"state dict does not match {manifest_path} "
            f"({manifest['source']}):\n  " + "\n  ".join(problems[:12])
            + ("" if len(problems) <= 12 else f"\n  ... {len(problems)-12} more")
        )


def convert(pth_path: str, out_path: str, manifest: str | None = None,
            check_hash: bool = True) -> None:
    import torch

    state = torch.load(pth_path, map_location="cpu", weights_only=True)
    if manifest is not None:
        verify_against_manifest(state, manifest, pth_path, check_hash)
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
    print(f"wrote {len(out)} arrays to {out_path}"
          + (" (manifest-verified)" if manifest else ""))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--pth", required=True, help="torchvision vgg19 .pth checkpoint")
    p.add_argument("--out", default="weights/vgg19_imagenet.npz")
    p.add_argument("--manifest", default=DEFAULT_MANIFEST,
                   help="manifest to verify against ('' disables)")
    p.add_argument("--no-hash-check", action="store_true",
                   help="skip the archive sha256-prefix check (shapes still "
                        "verified)")
    args = p.parse_args()
    convert(args.pth, args.out, manifest=args.manifest or None,
            check_hash=not args.no_hash_check)
