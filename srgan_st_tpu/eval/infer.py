"""Standalone super-resolution inference: upscale images with no GT.

The reference's only inference surface is validate.py's paired test()
loop (validate.py:61-113), which requires ground truth; users who just
want to upscale images have no entry point. This CLI closes that gap:

    python -m srgan_st_tpu.eval.infer \
        --gpath results/patchwise-st/g_best.npz \
        --input photos/ --output photos_x4/ [--tiled] [--bf16]

* accepts a single image file or a directory (png/jpg/bmp/tif);
* `--tiled` runs the halo-tiled applier (eval/tiled.py) so arbitrarily
  large images reuse ONE compiled shape and bound device memory — the
  serving configuration benched by `bench.py --only infer-4k`;
* `--exp_name bicubic` / `nearest` select the baseline upscalers
  (same substitution contract as test(), reference validate.py:48-51);
* `--artifact model.srganx` serves from an exported StableHLO artifact
  (eval/export.py) — no model code or checkpoint loading; the upscale
  factor comes from the artifact header;
* odd image sizes are right/bottom edge-padded to even dims for the
  generator's packed ops and cropped back exactly after upscaling.

Outputs are PNG (lossless), named <stem>_x<factor>.png.
"""

from __future__ import annotations

import os

import numpy as np


def _load_rgb(path: str) -> np.ndarray:
    from srgan_st_tpu.data.pipeline import _decode_rgb

    return _decode_rgb(path).astype(np.float32) / 255.0


def _save_png(path: str, img01: np.ndarray) -> None:
    from PIL import Image

    arr = np.clip(np.rint(img01 * 255.0), 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def make_infer_fn(config, gpath: str | None = None):
    """Jitted `fn(lr_nhwc float32 [0,1]) -> sr_nhwc` for the configured
    generator (or the bicubic/nearest baselines via EXP.NAME)."""
    if config.EXP.NAME == "bicubic":
        from srgan_st_tpu.models.baselines import BicubicUpscaler

        return BicubicUpscaler(config.DATA.UPSCALE_FACTOR)
    if config.EXP.NAME == "nearest":
        from srgan_st_tpu.models.baselines import NearestNeighbourUpscaler

        return NearestNeighbourUpscaler(config.DATA.UPSCALE_FACTOR)

    from srgan_st_tpu.eval.validate import make_generator_apply
    from srgan_st_tpu.train.checkpoint import load_params_npz

    if not gpath:
        gpath = f"results/{config.EXP.NAME}/g_best.npz"
    variables = load_params_npz(gpath)
    # the checkpoint, not the default config, defines the architecture —
    # a non-default width/depth/upscale generator must serve without
    # flags (same derivation the exporter uses)
    from srgan_st_tpu.eval.export import derive_arch

    arch = derive_arch(variables)
    config.MODEL.G_N_CHANNEL = arch["channels"]
    config.MODEL.G_N_RCB = arch["num_rcb"]
    config.DATA.UPSCALE_FACTOR = arch["upscale"]
    return make_generator_apply(config, variables)


def upscale_image(apply_fn, lr01: np.ndarray, factor: int) -> np.ndarray:
    """Upscale one HWC [0,1] image; pads odd sizes to even and crops the
    output back (the generator's fused reconstruction ops assume even
    LR dims; padding by edge replication keeps the interior exact)."""
    import jax

    h, w = lr01.shape[:2]
    ph, pw = h % 2, w % 2
    if ph or pw:
        lr01 = np.pad(lr01, ((0, ph), (0, pw), (0, 0)), mode="edge")
    sr = np.asarray(apply_fn(jax.device_put(lr01[None])))[0]
    return sr[: h * factor, : w * factor]


def _list_inputs(path: str) -> list[str]:
    exts = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff")
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.lower().endswith(exts)
        )
    return [path]


def main(argv=None) -> None:
    import argparse

    from srgan_st_tpu.core.config import Config

    parser = argparse.ArgumentParser(
        description="Upscale images (no ground truth needed). "
        "--exp_name bicubic/nearest selects a baseline upscaler."
    )
    parser.add_argument("--input", type=str, required=True,
                        help="image file or directory")
    parser.add_argument("--output", type=str, required=True,
                        help="output directory")
    parser.add_argument("--gpath", type=str, default=None,
                        help="generator weights (.npz); default "
                             "results/<exp_name>/g_best.npz")
    parser.add_argument("--artifact", type=str, default=None,
                        help="serve from an exported StableHLO artifact "
                             "(.srganx, see eval/export.py) instead of "
                             "weights + model code; upscale is read from "
                             "the artifact header")
    parser.add_argument("--exp_name", type=str, default="srgan")
    parser.add_argument("--upscale", type=int, default=4)
    parser.add_argument("--tiled", action="store_true",
                        help="halo-tiled inference: one compiled shape "
                             "for any image size, bounded memory")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute (validated: converges "
                             "identically in training; serving-safe)")
    parser.add_argument("--ensemble", action="store_true",
                        help="geometric x8 self-ensemble (~0.1-0.2 dB "
                             "PSNR at 8x the inference cost)")
    args = parser.parse_args(argv)

    config = Config()
    config.EXP.NAME = args.exp_name
    config.DATA.UPSCALE_FACTOR = args.upscale
    config.TPU.TILED_EVAL = args.tiled
    if args.bf16:
        config.TPU.COMPUTE_DTYPE = "bfloat16"

    files = _list_inputs(args.input)
    if not files:
        raise SystemExit(f"no images found under {args.input}")
    os.makedirs(args.output, exist_ok=True)
    if args.artifact:
        # an artifact is a sealed program: its compute dtype is baked in
        # and it runs whole inputs — flags that reconfigure the live model
        # would be silently ignored, so reject them instead
        for flag, given in (("--tiled", args.tiled), ("--bf16", args.bf16),
                            ("--gpath", args.gpath)):
            if given:
                raise SystemExit(
                    f"{flag} does not apply when serving from --artifact "
                    "(export-time choice; see eval/export.py)"
                )
        from srgan_st_tpu.eval.export import load_runner

        apply_fn = load_runner(args.artifact)
        args.upscale = int(apply_fn.meta["upscale"])
    else:
        apply_fn = make_infer_fn(config, gpath=args.gpath)
    if args.ensemble:
        from srgan_st_tpu.eval.ensemble import self_ensemble

        fixed = getattr(apply_fn, "meta", {}).get("fixed_shape")
        if fixed and fixed[1] != fixed[2]:
            raise SystemExit(
                "--ensemble rotates inputs by 90deg, so a fixed-shape "
                f"artifact must be square; this one is pinned to "
                f"{fixed[1]}x{fixed[2]} (re-export without --fixed for a "
                "shape-polymorphic artifact)"
            )
        apply_fn = self_ensemble(apply_fn)
    for i, path in enumerate(files):
        lr = _load_rgb(path)
        sr = upscale_image(apply_fn, lr, args.upscale)
        stem = os.path.splitext(os.path.basename(path))[0]
        out = os.path.join(args.output, f"{stem}_x{args.upscale}.png")
        _save_png(out, sr)
        print(f"[{i + 1}/{len(files)}] {path} "
              f"{lr.shape[1]}x{lr.shape[0]} -> {out} "
              f"{sr.shape[1]}x{sr.shape[0]}")


if __name__ == "__main__":
    main()
