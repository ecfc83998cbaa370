"""Paper-figure rendering: GT image with a marked crop + per-generator SR
crops of the same region (reference visualization/save_image_patch.py:20-95).

For each named experiment the generator's `g_best.npz` is loaded from
results/{name}/ and run on the LR image; the crop region is extracted from
the SR output, and the GT gets a red rectangle marking the region. Outputs
land in `out_dir` as `{image}_gt_box.png` + `{image}_{exp}.png`.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

import jax.numpy as jnp


def _load_rgb(path: str) -> np.ndarray:
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def _draw_box(img: np.ndarray, y: int, x: int, h: int, w: int,
              color=(255, 0, 0), thickness: int = 3) -> np.ndarray:
    out = img.copy()
    t = thickness
    out[y:y + h, x:x + t] = color
    out[y:y + h, x + w - t:x + w] = color
    out[y:y + t, x:x + w] = color
    out[y + h - t:y + h, x:x + w] = color
    return out


def save_image_patch(
    config,
    generator_names: list[str],
    image_name: str,
    y: int,
    x: int,
    patch_size: int = 96,
    out_dir: str = "figures",
    results_root: str = "results",
) -> list[str]:
    """Render the comparison figure set; returns written paths.

    generator_names may include "bicubic" / "nearest" / "gt" baselines in
    addition to experiment names (like the reference's generator list).
    """
    from srgan_st_tpu.eval.validate import make_generator_apply
    from srgan_st_tpu.models.baselines import BicubicUpscaler, NearestNeighbourUpscaler
    from srgan_st_tpu.train.checkpoint import load_params_npz

    os.makedirs(out_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(image_name))[0]
    written = []

    gt = _load_rgb(os.path.join(config.DATA.TEST_GT_IMAGES_DIR, image_name))
    lr_path = os.path.join(config.DATA.TEST_LR_IMAGES_DIR, image_name)
    lr = _load_rgb(lr_path).astype(np.float32) / 255.0

    boxed = _draw_box(gt, y, x, patch_size, patch_size)
    p = os.path.join(out_dir, f"{stem}_gt_box.png")
    Image.fromarray(boxed).save(p)
    written.append(p)

    for name in generator_names:
        if name == "gt":
            crop = gt[y:y + patch_size, x:x + patch_size]
        else:
            if name == "bicubic":
                apply_fn = BicubicUpscaler(config.DATA.UPSCALE_FACTOR)
            elif name == "nearest":
                apply_fn = NearestNeighbourUpscaler(config.DATA.UPSCALE_FACTOR)
            else:
                variables = load_params_npz(
                    os.path.join(results_root, name, "g_best.npz")
                )
                apply_fn = make_generator_apply(config, variables)
            sr = np.asarray(apply_fn(jnp.asarray(lr[None])))[0]
            sr_u8 = np.clip(np.round(sr * 255), 0, 255).astype(np.uint8)
            crop = sr_u8[y:y + patch_size, x:x + patch_size]
        p = os.path.join(out_dir, f"{stem}_{name}.png")
        Image.fromarray(crop).save(p)
        written.append(p)
    return written
