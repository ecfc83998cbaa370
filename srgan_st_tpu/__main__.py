"""Unified command-line front door: ``python -m srgan_st_tpu <command>``.

The reference exposes its workflows as separate scripts (main.py,
validate.py ``__main__``, utils/prepare_dataset.py, visualization/*); this
module routes them through one dispatcher so a user can discover every
workflow from ``--help`` without knowing the module layout.  Each command
forwards to the existing per-module CLI (same flags as running the module
directly) and is imported lazily — the top-level ``--help`` never
initializes jax or claims an accelerator.

Usage:
    python -m srgan_st_tpu run              # job_index experiment sweep
    python -m srgan_st_tpu train ...        # GAN phase driver
    python -m srgan_st_tpu warmup ...       # PSNR/SRResNet phase driver
    python -m srgan_st_tpu validate ...     # PSNR/SSIM eval on a test set
    python -m srgan_st_tpu infer ...        # upscale arbitrary images
    python -m srgan_st_tpu export ...       # StableHLO serving artifact
    python -m srgan_st_tpu prepare-dataset  # raster-tile + pack patches
    python -m srgan_st_tpu curves ...       # training-curve plots
    python -m srgan_st_tpu feature-maps ... # content-loss feature viz
    python -m srgan_st_tpu doctor           # accelerator health probe
"""

from __future__ import annotations

import sys

# command -> (module, attr, one-line help). Every target is a
# ``main(argv=None)`` argparse CLI except ``run``/``train``/``warmup``
# (reference-style config-driven drivers, see each docstring).
_COMMANDS: dict[str, tuple[str, str, str]] = {
    "run": (
        "srgan_st_tpu.main", "main",
        "job_index-driven experiment sweep (reference main.py semantics)",
    ),
    "train": (
        "srgan_st_tpu.train.train", "cli",
        "GAN-phase training driver (config-driven; flags override)",
    ),
    "warmup": (
        "srgan_st_tpu.train.warmup", "cli",
        "PSNR/SRResNet warmup driver (config-driven; flags override)",
    ),
    "validate": (
        "srgan_st_tpu.eval.validate", "main",
        "PSNR/SSIM evaluation on a test set (Set5-style layout)",
    ),
    "infer": (
        "srgan_st_tpu.eval.infer", "main",
        "upscale image files/directories (weights or .srganx artifact)",
    ),
    "export": (
        "srgan_st_tpu.eval.export", "main",
        "export a StableHLO serving artifact (.srganx)",
    ),
    "prepare-dataset": (
        "srgan_st_tpu.data.prepare_dataset", "main",
        "tile images into training patches (+ optional packed archive)",
    ),
    "curves": (
        "srgan_st_tpu.viz.training_curves", "main",
        "plot training curves from TB events / JSONL scalars",
    ),
    "feature-maps": (
        "srgan_st_tpu.viz.feature_maps", "main",
        "visualize content-loss feature maps for an image pair",
    ),
    "buddy-viz": (
        "srgan_st_tpu.viz.buddy_illustration", "main",
        "mark a patch and its best-buddy candidates on an image",
    ),
    "doctor": (
        "srgan_st_tpu.utils.tpu_health", "main",
        "probe accelerator claimability and diagnose wedged runtimes",
    ),
}


def _usage() -> str:
    width = max(len(name) for name in _COMMANDS)
    lines = [
        "usage: python -m srgan_st_tpu <command> [args...]",
        "",
        "commands:",
        *(f"  {name:<{width}}  {help_}" for name, (_, _, help_) in _COMMANDS.items()),
        "",
        "Run `python -m srgan_st_tpu <command> --help` for per-command flags.",
    ]
    return "\n".join(lines)


def main(argv: list[str] | None = None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(_usage())
        return
    name, rest = argv[0], argv[1:]
    if name not in _COMMANDS:
        print(f"unknown command: {name!r}\n\n{_usage()}", file=sys.stderr)
        raise SystemExit(2)
    module_name, attr, _ = _COMMANDS[name]
    import importlib

    fn = getattr(importlib.import_module(module_name), attr)
    fn(rest)


if __name__ == "__main__":
    main()
