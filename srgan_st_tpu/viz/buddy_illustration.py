"""Best-buddy patch illustration (reference visualization/
visualizations.ipynb cells 4-10: "Visualize the best-buddy patch for a
given image").

For a chosen target patch of an image, finds its k nearest patches under
the Best-Buddy score (the same multi-scale candidate bank and combined
pairwise distance as `losses/functions.best_buddy_loss`, reference
loss.py:78-141 — here with sr=gt=the image, exactly like the notebook's
`bestbuddy(im, im, k)`), then renders:

  * `{stem}_buddies.png` — the image with the target patch boxed in BLUE
    and its full-scale best buddies boxed in RED (the notebook's
    `mark_patch` colors);
  * `{stem}_buddy_{rank}.png` — the crop of each buddy, taken from the
    bank scale it lives at (the notebook only handled full-scale buddies;
    buddies from the 1/2- and 1/4-scale banks are cropped from the
    downscaled images and noted in the returned metadata instead of being
    drawn on the full-scale canvas, where they have no location);
  * `{stem}_target.png` — the target crop.

Pure numpy/PIL rendering (same conventions as viz/save_image_patch.py);
the scoring runs through the library's own ops so the illustration shows
the real selection semantics, not a reimplementation.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

import jax.numpy as jnp

from srgan_st_tpu.ops.pairwise import batch_pairwise_distance
from srgan_st_tpu.ops.patches import extract_patches
from srgan_st_tpu.ops.resize import resize_bicubic


def _load_rgb01(path: str) -> np.ndarray:
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.float32) / 255.0


def _draw_box(img: np.ndarray, y: int, x: int, size: int, color) -> None:
    """In-place 2px box around [y:y+size, x:x+size] (clamped to bounds)."""
    h, w = img.shape[:2]
    y0, x0 = max(y - 1, 0), max(x - 1, 0)
    y1, x1 = min(y + size + 1, h), min(x + size + 1, w)
    img[y0:y1, x0:min(x0 + 2, w)] = color
    img[y0:y1, max(x1 - 2, 0):x1] = color
    img[y0:min(y0 + 2, h), x0:x1] = color
    img[max(y1 - 2, 0):y1, x0:x1] = color


def buddy_illustration(
    image_path: str,
    target_patch: int | tuple[int, int],
    k: int = 6,
    ksize: int = 15,
    alpha: float = 1.0,
    beta: float = 1.0,
    dist_norm: str = "l2",
    out_dir: str = "figures",
) -> dict:
    """Render the best-buddy illustration; returns metadata + written paths.

    `target_patch` is either a flat non-overlapping patch index (the
    notebook's convention) or (row, col) patch-grid coordinates. The k
    buddies are the k smallest-score bank entries EXCLUDING the target
    patch itself (whose distance is trivially 0 when sr == gt).
    """
    img = _load_rgb01(image_path)
    # crop to a multiple of ksize (notebook cell 8 crops to 15*51)
    h, w = (img.shape[0] // ksize) * ksize, (img.shape[1] // ksize) * ksize
    img = img[:h, :w]
    nh, nw = h // ksize, w // ksize

    if isinstance(target_patch, tuple):
        t_row, t_col = target_patch
        target = t_row * nw + t_col
    else:
        target = int(target_patch)
        t_row, t_col = divmod(target, nw)
    if not (0 <= target < nh * nw):
        raise ValueError(f"target patch {target} outside the {nh}x{nw} grid")

    x = jnp.asarray(img)[None]  # (1, H, W, 3)
    p = extract_patches(x, ksize, ksize)  # (1, N, d)
    scales = [(1.0, x)]
    bank_parts, part_meta = [p], []
    n_full = p.shape[1]
    part_meta.append((1.0, nh, nw))
    for s in (0.5, 0.25):
        xs = resize_bicubic(x, s, method="torch")
        hs, ws = xs.shape[1], xs.shape[2]
        # trim to full patches (torch unfold drops the remainder)
        ps = extract_patches(xs[:, : (hs // ksize) * ksize,
                                : (ws // ksize) * ksize], ksize, ksize)
        bank_parts.append(ps)
        part_meta.append((s, hs // ksize, ws // ksize))
        scales.append((s, xs))
    bank = jnp.concatenate(bank_parts, axis=1)

    # sr == gt == the image here (notebook cell 9), so the combined score
    # alpha*d(p1,bank) + beta*d(p2,bank) collapses to one distance
    score = (alpha + beta) * batch_pairwise_distance(p, bank, dist_norm)
    row = np.array(score[0, target])  # (M,) writable host copy
    row[target] = np.inf  # self-match is trivially the 1st buddy
    order = np.argsort(row, kind="stable")[:k]

    os.makedirs(out_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(image_path))[0]
    canvas = img.copy()
    _draw_box(canvas, t_row * ksize, t_col * ksize, ksize, (0.0, 0.0, 1.0))

    buddies, written = [], []
    tgt_path = os.path.join(out_dir, f"{stem}_target.png")
    Image.fromarray(
        (img[t_row * ksize:(t_row + 1) * ksize,
             t_col * ksize:(t_col + 1) * ksize] * 255).round().astype(np.uint8)
    ).save(tgt_path)
    written.append(tgt_path)

    for rank, idx in enumerate(order, start=1):
        idx = int(idx)
        off = 0
        for (scale, gh, gw), part in zip(part_meta, bank_parts):
            if idx < off + part.shape[1]:
                local = idx - off
                by, bx = divmod(local, gw)
                break
            off += part.shape[1]
        src = np.asarray(dict(scales)[scale][0])
        crop = src[by * ksize:(by + 1) * ksize, bx * ksize:(bx + 1) * ksize]
        crop_path = os.path.join(out_dir, f"{stem}_buddy_{rank}.png")
        Image.fromarray((crop * 255).round().astype(np.uint8)).save(crop_path)
        written.append(crop_path)
        if scale == 1.0:
            _draw_box(canvas, by * ksize, bx * ksize, ksize, (1.0, 0.0, 0.0))
        buddies.append({"rank": rank, "bank_index": idx, "scale": scale,
                        "row": int(by), "col": int(bx),
                        "score": float(row[idx])})

    marked_path = os.path.join(out_dir, f"{stem}_buddies.png")
    Image.fromarray((canvas * 255).round().astype(np.uint8)).save(marked_path)
    written.append(marked_path)
    return {"target": {"index": target, "row": t_row, "col": t_col},
            "buddies": buddies, "written": written,
            "grid": (nh, nw), "ksize": ksize}


def main(argv=None) -> None:
    import argparse

    p = argparse.ArgumentParser(
        description="Best-buddy patch illustration: mark a target patch "
        "(blue) and its k best buddies (red) on an image."
    )
    p.add_argument("--image", required=True)
    p.add_argument("--patch", required=True,
                   help="flat patch index, or 'row,col' grid coordinates")
    p.add_argument("--k", type=int, default=6)
    p.add_argument("--ksize", type=int, default=15)
    p.add_argument("--out", default="figures")
    args = p.parse_args(argv)
    patch = (tuple(int(v) for v in args.patch.split(","))
             if "," in args.patch else int(args.patch))
    meta = buddy_illustration(args.image, patch, k=args.k,
                              ksize=args.ksize, out_dir=args.out)
    for b in meta["buddies"]:
        print(f"buddy {b['rank']}: scale {b['scale']} "
              f"grid ({b['row']}, {b['col']}) score {b['score']:.5f}")
    for path in meta["written"]:
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
