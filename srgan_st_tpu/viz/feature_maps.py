"""Feature-map figures for the content losses.

Counterpart of the reference's contentlosses-visualization notebook
(SURVEY.md §2.9): renders grids of VGG19 / discriminator tap activations
for an image, to inspect what the perceptual losses compare.

Usage:
    python -m srgan_st_tpu.viz.feature_maps --image img.png \
        --extractor disc --out figures/
"""

from __future__ import annotations

import argparse
import math
import os

import numpy as np
import jax
import jax.numpy as jnp


def _activation_grid(act: np.ndarray, max_maps: int = 64) -> np.ndarray:
    """(H, W, C) activations -> tiled grayscale grid image (uint8)."""
    h, w, c = act.shape
    c = min(c, max_maps)
    cols = int(math.ceil(math.sqrt(c)))
    rows = int(math.ceil(c / cols))
    grid = np.zeros((rows * h, cols * w), np.float32)
    for i in range(c):
        fm = act[..., i]
        lo, hi = fm.min(), fm.max()
        fm = (fm - lo) / max(hi - lo, 1e-6)
        r, col = divmod(i, cols)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = fm
    return (grid * 255.0 + 0.5).astype(np.uint8)


def render_feature_maps(config, image_path: str, extractor: str = "disc",
                        out_dir: str = "figures") -> list[str]:
    from PIL import Image

    from srgan_st_tpu.ops.color import imagenet_normalize

    with Image.open(image_path) as im:
        img = np.asarray(im.convert("RGB"), np.float32)[None] / 255.0

    if extractor == "vgg":
        from srgan_st_tpu.models.vgg import VGG19Features, load_vgg19_npz

        layer_weights = config.MODEL.G_LOSS.VGG19_LAYERS
        taps = tuple(layer_weights)
        model = VGG19Features(taps=taps)
        try:
            variables = load_vgg19_npz(config.MODEL.G_LOSS.VGG19_WEIGHTS, taps)
        except FileNotFoundError:
            variables = model.init(jax.random.key(0), jnp.zeros((1, 96, 96, 3)))
        feats = model.apply(variables, imagenet_normalize(jnp.asarray(img)))
    elif extractor == "disc":
        from srgan_st_tpu.models.discriminator import Discriminator

        taps = tuple(config.MODEL.G_LOSS.DISC_FEATURES_LOSS_LAYERS)
        model = Discriminator.from_config(config)
        size = img.shape[1]
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, size, img.shape[2], 3)), train=False
        )
        feats = model.apply(
            variables, imagenet_normalize(jnp.asarray(img)), train=False, taps=taps
        )
    else:
        raise ValueError(f"unknown extractor {extractor}")

    from PIL import Image as PILImage

    os.makedirs(out_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(image_path))[0]
    written = []
    for name, act in feats.items():
        grid = _activation_grid(np.asarray(act)[0])
        path = os.path.join(out_dir, f"{stem}_{extractor}_{name.replace('.', '_')}.png")
        PILImage.fromarray(grid).save(path)
        written.append(path)
    return written


def main(argv=None) -> None:
    from srgan_st_tpu.core.config import Config

    p = argparse.ArgumentParser()
    p.add_argument("--image", required=True)
    p.add_argument("--extractor", choices=["vgg", "disc"], default="disc")
    p.add_argument("--out", default="figures")
    args = p.parse_args(argv)
    for path in render_feature_maps(Config(), args.image, args.extractor, args.out):
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
