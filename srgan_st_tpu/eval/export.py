"""Ahead-of-time model export: serialized StableHLO serving artifacts.

The reference has no deployment story at all — serving means keeping the
training repo + torch around and re-loading `g_best.pth` (reference
validate.py:28-58). The TPU-native export path compiles the eval-mode
generator ONCE into a portable StableHLO artifact (`jax.export`) that any
XLA runtime can execute — no Python model code, no flax, no checkpoint
loading at serving time:

    python -m srgan_st_tpu.eval.export \
        --gpath results/patchwise-st/g_best.npz --out srgan_x4.srganx

    from srgan_st_tpu.eval.export import load_runner
    run = load_runner("srgan_x4.srganx")      # fn(lr_nhwc01) -> sr_nhwc01
    sr = run(lr)                              # any (B, H, W, 3), any size

Properties:

* **Shape-polymorphic by default**: exported with symbolic (b, h, w)
  dimensions, so ONE artifact serves every batch/image size (odd sizes
  included — the shape-gated fast paths fall back to shape-agnostic
  formulations under symbolic dims, ops/subpixel_conv.py
  `_concrete_pred`). `--fixed BxHxW` pins shapes instead where a serving
  stack wants the XLA program specialized (and the TPU fast paths baked
  in) at known sizes.
* **Multi-platform**: lowered for ("tpu", "cpu") by default — the same
  bytes run on either (`jax.export` cross-platform lowering), chosen at
  load time by the executing backend.
* **Self-describing**: the artifact carries a JSON header (upscale
  factor, model dims, dtype, platforms, calling convention, jax version)
  readable without deserializing the program: `inspect_artifact(path)`.
* **Pure XLA**: export forces the plain-XLA formulations of the gated
  Pallas paths (conv3_inner=1), so artifacts contain no Mosaic custom
  calls and stay portable across TPU generations and to CPU.

Weights are baked into the program as constants — the artifact is the
complete model. bf16 export (`--bf16`) embeds the bf16-compute graph
(validated to converge identically in training; serving-safe).
"""

from __future__ import annotations

import json
import math
import os
import re

import numpy as np

_MAGIC = b"SRGANX1\n"


def derive_arch(variables) -> dict:
    """Recover (channels, num_rcb, upscale) from a generator variable tree
    so export needs no architecture flags — the dims in the artifact header
    are always those of the actual weights.  conv1's kernel carries the
    width, the ``rcb{i}`` subtrees the depth, and each ``up{i}`` block's
    conv expands channels by r^2 (generator.py UpsampleBlock)."""
    params = variables.get("params", variables)
    channels = int(np.asarray(params["conv1"]["kernel"]).shape[-1])
    num_rcb = sum(1 for k in params if re.fullmatch(r"rcb\d+", k))
    upscale = 1
    for k in params:
        if re.fullmatch(r"up\d+", k):
            out = int(np.asarray(params[k]["conv"]["kernel"]).shape[-1])
            upscale *= math.isqrt(out // channels)
    return {"channels": channels, "num_rcb": num_rcb, "upscale": upscale}


def _build_eval_fn(config, variables):
    """Eval-mode generator apply (running BN stats, clamp [0,1]) with the
    Pallas-gated paths forced to their portable XLA formulations."""
    import jax

    from srgan_st_tpu.models.generator import Generator

    g_model = Generator.from_config(config).clone(conv3_inner=1)
    return jax.jit(lambda x: g_model.apply(variables, x, train=False))


def export_generator(config, variables, *, platforms=("tpu", "cpu"),
                     fixed_shape: tuple[int, int, int] | None = None):
    """Serialize the eval-mode generator; returns (blob, meta).

    `fixed_shape` = (B, H, W) pins the input shape; None exports with
    symbolic (b, h, w) — one artifact for any size."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    fn = _build_eval_fn(config, variables)
    if fixed_shape is None:
        b, h, w = jexport.symbolic_shape("b, h, w")
        spec = "b,h,w,3"
    else:
        b, h, w = fixed_shape
        spec = f"{b},{h},{w},3"
    exp = jexport.export(fn, platforms=tuple(platforms))(
        jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32)
    )
    n_params = sum(
        np.asarray(p).size
        for p in jax.tree_util.tree_leaves(variables.get("params", variables))
    )
    meta = {
        "format": "srgan-st-tpu/stablehlo",
        "input": f"NHWC float32 in [0,1], shape ({spec})",
        "output": "NHWC float32 in [0,1], H and W scaled by `upscale`",
        "upscale": int(config.DATA.UPSCALE_FACTOR),
        "channels": int(config.MODEL.G_N_CHANNEL),
        "num_rcb": int(config.MODEL.G_N_RCB),
        "compute_dtype": str(config.TPU.COMPUTE_DTYPE),
        "platforms": list(exp.platforms),
        "fixed_shape": list(fixed_shape) if fixed_shape else None,
        "n_params": int(n_params),
        "jax_version": jax.__version__,
    }
    return exp.serialize(), meta


def save_artifact(path: str, blob: bytes, meta: dict) -> None:
    header = json.dumps(meta).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(len(header).to_bytes(8, "little"))
        f.write(header)
        f.write(blob)


def _read_header(f, path: str) -> dict:
    """Parse the on-disk header (magic, 8-byte LE length, JSON); leaves
    the file positioned at the serialized program."""
    if f.read(len(_MAGIC)) != _MAGIC:
        raise ValueError(f"{path}: not a srgan-st-tpu export artifact")
    n = int.from_bytes(f.read(8), "little")
    return json.loads(f.read(n))


def inspect_artifact(path: str) -> dict:
    """Read the JSON header without touching the serialized program."""
    with open(path, "rb") as f:
        return _read_header(f, path)


def load_runner(path: str):
    """Deserialize an artifact into a callable `fn(lr_nhwc01) -> sr`;
    `fn.meta` carries the artifact header."""
    from jax import export as jexport

    with open(path, "rb") as f:
        meta = _read_header(f, path)
        exp = jexport.deserialize(f.read())

    def run(lr):
        return exp.call(lr)

    run.meta = meta
    return run


def main(argv=None) -> None:
    import argparse

    from srgan_st_tpu.core.config import Config
    from srgan_st_tpu.train.checkpoint import load_params_npz

    parser = argparse.ArgumentParser(
        description="Export the generator as a portable StableHLO serving "
        "artifact (shape-polymorphic by default)."
    )
    parser.add_argument("--gpath", type=str, required=True,
                        help="generator weights (.npz)")
    parser.add_argument("--out", type=str, required=True,
                        help="output artifact path (.srganx)")
    parser.add_argument("--upscale", type=int, default=None,
                        help="cross-check only: the factor (like the model "
                             "width/depth) is derived from the weights; a "
                             "mismatch errors out")
    parser.add_argument("--platforms", type=str, default="tpu,cpu",
                        help="comma-separated lowering targets")
    parser.add_argument("--fixed", type=str, default=None,
                        help="pin input shape BxHxW (default: symbolic)")
    parser.add_argument("--bf16", action="store_true",
                        help="embed the bfloat16-compute graph")
    args = parser.parse_args(argv)

    config = Config()
    if args.bf16:
        config.TPU.COMPUTE_DTYPE = "bfloat16"
    fixed = None
    if args.fixed:
        fixed = tuple(int(v) for v in args.fixed.lower().split("x"))
        if len(fixed) != 3:
            raise SystemExit(f"--fixed expects BxHxW, got {args.fixed}")
    variables = load_params_npz(args.gpath)
    # the checkpoint, not flags, defines the architecture — non-default
    # widths/depths export without any extra arguments
    arch = derive_arch(variables)
    config.MODEL.G_N_CHANNEL = arch["channels"]
    config.MODEL.G_N_RCB = arch["num_rcb"]
    config.DATA.UPSCALE_FACTOR = arch["upscale"]
    if args.upscale is not None and args.upscale != arch["upscale"]:
        raise SystemExit(
            f"--upscale {args.upscale} conflicts with the checkpoint "
            f"(x{arch['upscale']} per its upsample-block shapes)"
        )
    blob, meta = export_generator(
        config, variables,
        platforms=tuple(p.strip() for p in args.platforms.split(",")),
        fixed_shape=fixed,
    )
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_artifact(args.out, blob, meta)
    print(f"{args.out}: {os.path.getsize(args.out)} bytes  "
          f"{json.dumps(meta)}")


if __name__ == "__main__":
    main()
