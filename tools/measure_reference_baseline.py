"""Measure the reference input-pipeline cost by EXECUTING the reference.

Replaces the round-1 estimated A100 baseline (bench.py) with a measured
anchor.  Methodology (documented in BASELINE.md):

The reference trains with ONE persistent DataLoader worker
(train.py:36-40) whose __getitem__ does `read_image(path)` +
`Bicubic()(gt, scale=0.25)` per 96^2 sample ON CPU (dataset.py:27-28).
With pin_memory + persistent workers the pipeline overlaps GPU compute,
so steady-state throughput = min(pipeline rate, GPU compute rate).  This
tool measures the pipeline rate by importing and running the reference's
own `bicubic.py` (read-only, executed not transcribed) on this host, with
cv2.imread standing in for torchvision.io.read_image (torchvision is not
installed here; cv2's libpng decode is at least as fast, which biases the
baseline IN THE REFERENCE'S FAVOR).  It also times the reference G and D
fwd+bwd on CPU torch for context.

The LSF job reserves 1 core / 5 GB (train.sh), so a single-core host
measurement is the right model for the reference's loader.

Usage: python tools/measure_reference_baseline.py
Prints a JSON dict of measured numbers.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

import cv2
import numpy as np
import torch

REFERENCE = "/root/reference"
N_TIMING = 200
GT_SIZE = 96
UPSCALE = 4


def _make_patch_png(tmpdir: str) -> str:
    """A 96^2 RGB patch with natural-image-like statistics (smooth base +
    texture), so PNG decode cost is representative."""
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:GT_SIZE, 0:GT_SIZE].astype(np.float32) / GT_SIZE
    base = np.stack(
        [0.5 + 0.4 * np.sin(6 * xx + c) * np.cos(5 * yy) for c in range(3)], axis=-1
    )
    img = np.clip(base + 0.08 * rng.standard_normal(base.shape), 0, 1)
    path = str(Path(tmpdir) / "patch.png")
    cv2.imwrite(path, (img * 255).astype(np.uint8))
    return path


def main() -> None:
    torch.set_num_threads(1)  # reference LSF job: 1 core (train.sh)
    sys.dont_write_bytecode = True  # /root/reference is read-only
    sys.path.insert(0, REFERENCE)
    import bicubic as ref_bicubic  # executing the reference, not copying it

    results: dict[str, float] = {}

    with tempfile.TemporaryDirectory() as tmpdir:
        png = _make_patch_png(tmpdir)

        # --- decode (cv2 stand-in for torchvision read_image) ---
        for _ in range(20):
            cv2.imread(png)
        t0 = time.perf_counter()
        for _ in range(N_TIMING):
            img = cv2.imread(png)
        t_decode = (time.perf_counter() - t0) / N_TIMING
        results["decode_ms_per_sample"] = round(t_decode * 1e3, 3)

        # --- reference Bicubic.forward per sample, as dataset.py:27-28 ---
        bic = ref_bicubic.Bicubic()
        gt = torch.from_numpy(img).permute(2, 0, 1).float().unsqueeze(0) / 255.0
        for _ in range(20):
            bic(gt, scale=1.0 / UPSCALE)
        t0 = time.perf_counter()
        for _ in range(N_TIMING):
            lr = bic(gt, scale=1.0 / UPSCALE)
        t_bicubic = (time.perf_counter() - t0) / N_TIMING
        results["bicubic_ms_per_sample"] = round(t_bicubic * 1e3, 3)
        assert lr.shape == (1, 3, GT_SIZE // UPSCALE, GT_SIZE // UPSCALE)

    t_sample = t_decode + t_bicubic
    results["pipeline_ms_per_sample"] = round(t_sample * 1e3, 3)
    pipeline_rate = 1.0 / t_sample
    results["pipeline_patches_per_sec_1worker"] = round(pipeline_rate, 1)

    # --- reference models fwd+bwd on CPU torch (context only; the GPU
    # compute bound is estimated separately in BASELINE.md) ---
    import importlib.util

    spec = importlib.util.spec_from_file_location("ref_model", f"{REFERENCE}/model.py")
    ref_model = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_model)

    class _Dot(dict):
        __getattr__ = dict.__getitem__

    cfg = _Dot(
        MODEL=_Dot(
            G_IN_CHANNEL=3, G_OUT_CHANNEL=3, G_N_CHANNEL=64, G_N_RCB=16,
            D_IN_CHANNEL=3, D_OUT_CHANNEL=1, D_N_CHANNEL=64,
        ),
        DATA=_Dot(UPSCALE_FACTOR=UPSCALE),
        EXP=_Dot(NAME="baseline-measure"),
    )
    G = ref_model.Generator(cfg)
    D = ref_model.Discriminator(cfg)
    n_g = sum(p.numel() for p in G.parameters())
    n_d = sum(p.numel() for p in D.parameters())
    assert n_g == 1_547_350 and n_d == 23_563_649, (n_g, n_d)

    lr_b = torch.rand(16, 3, GT_SIZE // UPSCALE, GT_SIZE // UPSCALE)
    gt_b = torch.rand(16, 3, GT_SIZE, GT_SIZE)
    mse = torch.nn.MSELoss()

    def g_step():
        G.zero_grad(set_to_none=True)
        sr = G(lr_b)
        loss = mse(sr, gt_b) + D(sr).mean() * 1e-3
        loss.backward()

    for _ in range(2):
        g_step()
    n_steps = 5
    t0 = time.perf_counter()
    for _ in range(n_steps):
        g_step()
    t_step = (time.perf_counter() - t0) / n_steps
    results["cpu_torch_g_step_ms_batch16"] = round(t_step * 1e3, 1)
    results["cpu_torch_patches_per_sec"] = round(16 / t_step, 1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
