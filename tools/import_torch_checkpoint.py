"""Import reference PyTorch checkpoints (.pth) into this framework.

Optional parity tool (SURVEY.md §5): converts the reference's
`g_*.pth` / `d_*.pth` state dicts (reference train.py:211-218) into the npz
variables format used here, so reference-trained models can be evaluated
bit-comparably on TPU. Handles torch.compile's `_orig_mod.` key prefix
(reference utils.py:25-59) and the NCHW->NHWC layout changes:

  * conv kernels OIHW -> HWIO
  * PReLU (1,)-shaped alpha -> scalar
  * BatchNorm weight/bias/running_mean/running_var ->
    params.{scale,bias} + batch_stats.{mean,var}
  * the discriminator's first Linear gets its input columns permuted from
    the torch (C, H, W) flatten order to our (H, W, C).

Usage:
    python tools/import_torch_checkpoint.py --pth g_best.pth --model generator \
        --out results/imported/g_best.npz
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _strip_compile_prefix(state: dict) -> dict:
    if any(k.startswith("_orig_mod.") for k in state):
        return {k[len("_orig_mod."):]: v for k, v in state.items()}
    return state


def _conv(state, key):
    return {"kernel": state[f"{key}.weight"].transpose(2, 3, 1, 0)}


def _conv_b(state, key):
    return {
        "kernel": state[f"{key}.weight"].transpose(2, 3, 1, 0),
        "bias": state[f"{key}.bias"],
    }


def _bn(state, key):
    params = {"scale": state[f"{key}.weight"], "bias": state[f"{key}.bias"]}
    stats = {"mean": state[f"{key}.running_mean"], "var": state[f"{key}.running_var"]}
    return params, stats


def _prelu(state, key):
    return {"alpha": np.asarray(state[f"{key}.weight"]).reshape(())}


def import_generator(state: dict, num_rcb: int = 16) -> dict:
    """Reference Generator state dict (model.py:74-152) -> flax variables."""
    params: dict = {}
    stats: dict = {}
    params["conv1"] = _conv_b(state, "conv1.0")
    params["prelu1"] = _prelu(state, "conv1.1")
    for i in range(num_rcb):
        base = f"trunk.{i}.rcb"
        p: dict = {}
        p["conv1"] = _conv(state, f"{base}.0")
        p["bn1"], s1 = _bn(state, f"{base}.1")
        p["prelu"] = _prelu(state, f"{base}.2")
        p["conv2"] = _conv(state, f"{base}.3")
        p["bn2"], s2 = _bn(state, f"{base}.4")
        params[f"rcb{i}"] = p
        stats[f"rcb{i}"] = {"bn1": s1, "bn2": s2}
    params["conv2"] = _conv(state, "conv2.0")
    params["bn2"], stats["bn2"] = _bn(state, "conv2.1")
    i = 0
    while f"upsampling.{i}.upsample_block.0.weight" in state:
        params[f"up{i}"] = {
            "conv": _conv_b(state, f"upsampling.{i}.upsample_block.0"),
            "prelu": _prelu(state, f"upsampling.{i}.upsample_block.2"),
        }
        i += 1
    params["conv3"] = _conv_b(state, "conv3")
    return {"params": params, "batch_stats": stats}


def import_discriminator(state: dict, channels: int = 64) -> dict:
    """Reference Discriminator state dict (model.py:7-71) -> flax variables."""
    params: dict = {"conv0": _conv_b(state, "features.0")}
    stats: dict = {}
    for i in range(1, 8):
        params[f"conv{i}"] = _conv(state, f"features.{3 * i - 1}")
        params[f"bn{i}"], stats[f"bn{i}"] = _bn(state, f"features.{3 * i}")
    # fc1: permute input columns from torch's (C, H, W) flatten to our (H, W, C)
    w = state["classifier.0.weight"]  # (1024, C*6*6)
    c = channels * 8
    w = w.reshape(1024, c, 6, 6).transpose(0, 2, 3, 1).reshape(1024, 6 * 6 * c)
    params["fc1"] = {"kernel": w.T, "bias": state["classifier.0.bias"]}
    params["fc2"] = {
        "kernel": state["classifier.2.weight"].T,
        "bias": state["classifier.2.bias"],
    }
    return {"params": params, "batch_stats": stats}


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--pth", required=True)
    p.add_argument("--model", choices=["generator", "discriminator"], required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--num_rcb", type=int, default=16)
    p.add_argument("--channels", type=int, default=64)
    args = p.parse_args(argv)

    import torch

    from srgan_st_tpu.train.checkpoint import save_variables_npz

    state = torch.load(args.pth, map_location="cpu", weights_only=True)
    state = _strip_compile_prefix(state)
    state = {k: np.asarray(v) for k, v in state.items()}
    if args.model == "generator":
        variables = import_generator(state, args.num_rcb)
    else:
        variables = import_discriminator(state, args.channels)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_variables_npz(args.out, variables)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
