"""Cross-check tests/goldens/reference_goldens.npz by EXECUTING the reference.

The stored goldens were generated once from independent torch-CPU
implementations of the documented formulas (tests/goldens/README.md).
That leaves a same-misreading-twice risk: if the formulas in SURVEY.md
were mis-read, both the goldens and the JAX ops could agree while being
wrong.  This tool removes that risk by running the reference's OWN code
(`/root/reference/{bicubic,utils,loss}.py`, executed not transcribed) on
the stored golden inputs and comparing against the stored golden outputs.

Environment shims (the only deviations from stock reference execution,
each forced by this host):
  * `torch.Tensor.cuda` is patched to a no-op — the reference hard-codes
    `.cuda()` inside get_gaussian_kernel (utils.py:206-208), making the
    ST losses CUDA-only; there is no GPU here.
  * `torchvision` is absent; a minimal stub provides
    `transforms.Grayscale` with torchvision's documented ITU-R 601 luma
    (0.2989 R + 0.587 G + 0.114 B), the only torchvision symbol the
    checked losses touch.  (ContentLossVGG needs real torchvision weights
    and is out of scope here; its semantics are covered by
    tests/test_losses.py content-loss tests.)

Usage: python tools/crosscheck_goldens_vs_reference.py
Prints one line per check with max|diff|; exits nonzero on any failure.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch

REFERENCE = "/root/reference"
GOLDENS = "/root/repo/tests/goldens/reference_goldens.npz"

failures: list[str] = []


def check(name: str, got, want, atol: float = 1e-5, rtol: float = 1e-5) -> None:
    got = np.asarray(got.detach().numpy() if torch.is_tensor(got) else got)
    want = np.asarray(want)
    maxdiff = float(np.max(np.abs(got.astype(np.float64) - want.astype(np.float64))))
    ok = np.allclose(got, want, atol=atol, rtol=rtol)
    print(f"{'PASS' if ok else 'FAIL'}  {name:30s} max|diff|={maxdiff:.3e}")
    if not ok:
        failures.append(name)


class _Grayscale:
    """torchvision.transforms.Grayscale stub: ITU-R 601 luma on (..,3,H,W)."""

    def __init__(self, num_output_channels: int = 1):
        assert num_output_channels == 1

    def __call__(self, x: torch.Tensor) -> torch.Tensor:
        r, g, b = x.unbind(dim=-3)
        return (0.2989 * r + 0.587 * g + 0.114 * b).unsqueeze(dim=-3)


def _install_shims() -> None:
    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[assignment]
    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_models.feature_extraction = types.ModuleType(
        "torchvision.models.feature_extraction"
    )
    tv_models.feature_extraction.create_feature_extractor = None
    tv_transforms = types.ModuleType("torchvision.transforms")
    tv_transforms.Grayscale = _Grayscale
    tv_transforms.Normalize = None
    tv_utils = types.ModuleType("torchvision.utils")
    tv_utils.make_grid = None  # imported by utils.py:10, unused by the checks
    tv_io = types.ModuleType("torchvision.io")
    tv_io.read_image = None
    tv.models, tv.transforms, tv.utils, tv.io = tv_models, tv_transforms, tv_utils, tv_io
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv_models
    sys.modules["torchvision.models.feature_extraction"] = tv_models.feature_extraction
    sys.modules["torchvision.transforms"] = tv_transforms
    sys.modules["torchvision.utils"] = tv_utils
    sys.modules["torchvision.io"] = tv_io


def main() -> None:
    torch.manual_seed(0)
    sys.dont_write_bytecode = True  # /root/reference is read-only
    _install_shims()
    sys.path.insert(0, REFERENCE)
    import bicubic as ref_bicubic
    import loss as ref_loss
    import utils as ref_utils

    G = np.load(GOLDENS)
    t = lambda k: torch.from_numpy(G[k])

    # --- bicubic (bicubic.py:83-106) ---
    bic = ref_bicubic.Bicubic()
    for scale in (0.25, 0.5, 2.0, 4.0):
        with torch.no_grad():
            out = bic(t(f"bicubic_in_{scale}"), scale=scale)
        check(f"bicubic scale={scale}", out, G[f"bicubic_out_{scale}"], atol=2e-6)

    # --- batch_pairwise_distance (utils.py:157-191) ---
    check("pairwise l1 (x,y)",
          ref_utils.batch_pairwise_distance(t("pairwise_l1_y_x"), t("pairwise_l1_y_y"), "l1"),
          G["pairwise_l1_y_out"], atol=1e-6)
    check("pairwise l1 (x only)",
          ref_utils.batch_pairwise_distance(t("pairwise_l1_noy_x"), None, "l1"),
          G["pairwise_l1_noy_out"], atol=1e-6)
    check("pairwise l2 (x,y)",
          ref_utils.batch_pairwise_distance(t("pairwise_l2_y_x"), t("pairwise_l2_y_y"), "l2"),
          G["pairwise_l2_y_out"], atol=1e-5)
    check("pairwise l2 (x only)",
          ref_utils.batch_pairwise_distance(t("pairwise_l2_noy_x"), None, "l2"),
          G["pairwise_l2_noy_out"], atol=1e-5)

    # --- get_gaussian_kernel sigma=0.5 (utils.py:194-208) ---
    g05, dg05 = ref_utils.get_gaussian_kernel(0.5, also_dg=True)
    check("gaussian kernel sigma=0.5", g05, G["gauss_05"], atol=1e-7)
    check("gaussian dg sigma=0.5", dg05, G["gauss_05_dg"], atol=1e-6)

    # --- structure_tensor (utils.py:212-233) ---
    for sigma, rho in ((0.5, 2.0), (1.0, 10.0)):
        out = ref_utils.structure_tensor(t(f"st_in_{sigma}_{rho}"), sigma=sigma, rho=rho)
        check(f"structure_tensor s={sigma} r={rho}", out, G[f"st_out_{sigma}_{rho}"], atol=1e-6)

    # --- per-patch ST, the PST building block (loss.py:330-334 minus the
    # normalize, which the stpipe chain below covers) ---
    pin = t("st_patches_in")  # (7, 5, 3, 3) grayscale patches
    out = torch.stack([
        torch.stack([
            ref_utils.structure_tensor(pin[i, j][None], 0.5, 2.0)
            for j in range(pin.shape[1])
        ])
        for i in range(pin.shape[0])
    ])
    check("per-patch ST", out, G["st_patches_out"], atol=1e-5)

    # --- inv(S1)S2 -> eigenvalues -> distance chain (utils.py:242-280) ---
    m = ref_utils.compute_invS1xS2(t("stpipe_s1"), t("stpipe_s2"), _normalize=True)
    check("compute_invS1xS2", m, G["stpipe_m"], atol=1e-5)
    lam = ref_utils.compute_eigenvalues(torch.from_numpy(G["stpipe_m"]))
    check("compute_eigenvalues", lam, G["stpipe_lam"], atol=1e-5)
    d = ref_utils.compute_distance(torch.from_numpy(G["stpipe_lam"]))
    check("compute_distance", d, G["stpipe_d"], atol=1e-5)

    # --- the four stored loss scalars (loss.py defaults) ---
    sr24, gt24 = t("loss_sr24"), t("loss_gt24")
    with torch.no_grad():
        check("BestBuddyLoss l2/l1",
              ref_loss.BestBuddyLoss(dist_norm="l2", criterion="l1")(sr24, gt24),
              G["bb_l2_l1"], atol=1e-6)
        check("BestBuddyLoss l1/mse",
              ref_loss.BestBuddyLoss(dist_norm="l1", criterion="mse")(sr24, gt24),
              G["bb_l1_mse"], atol=1e-6)
        check("GramLoss", ref_loss.GramLoss()(sr24, gt24), G["gram"], atol=1e-6)
        check("PatchwiseStructureTensorLoss",
              ref_loss.PatchwiseStructureTensorLoss()(sr24, gt24), G["pst"], atol=1e-5)
        check("StructureTensorLoss",
              ref_loss.StructureTensorLoss()(t("loss_sr32"), t("loss_gt32")),
              G["st_loss"], atol=1e-5)

    if failures:
        print(f"\n{len(failures)} FAILED: {failures}")
        sys.exit(1)
    print("\nall goldens match reference execution")


if __name__ == "__main__":
    main()
