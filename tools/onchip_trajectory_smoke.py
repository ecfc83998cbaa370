"""On-chip trajectory smoke: replay the distilled trajectory goldens on the
REAL TPU backend and record the divergence from the executed reference.

All trajectory-parity evidence through round 3 was CPU-executed
(tests/test_trajectory.py and the full-size crosscheck runs force the CPU
backend for fp32 exactness). This tool closes the remaining gap — nothing
pinned the axon TPU backend's numerics — by running the same 20+20-step
windows (same torch-init weights, same data, same train/steps.py code,
the TPU's DEFAULT loss kernels incl. the Pallas buddy-select) on the chip
and comparing the per-step loss traces against the goldens.

Measured divergence (ONCHIP_r04_trajectory.log, all four recipes,
2026-08-19): the TPU traces track the goldens to 1.6e-4..2.1e-4 on the
first-5-step warmup G-loss, 1.4e-4..1.5e-3 on the GAN G-loss and
7.8e-4..4.4e-3 on the GAN D-loss — much tighter than the 1e-2-level
feared from TPU f32 matmuls running as bf16 MXU passes, because the
parity-critical contractions (bicubic resize, pairwise scores) already
pin precision=HIGHEST and the loss reductions accumulate in f32. The
gates below are that measured envelope with ~10x headroom; semantic
divergence (wrong optimizer/BN/selection behavior) shows at 1e-1+.

Emits one BENCH-style JSON line per recipe:
    {"metric": "onchip_trajectory_max_rel_err", "value": ..., ...}
and exits nonzero if any gate fails.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/onchip_trajectory_smoke.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)
_GOLDEN_DIR = os.path.join(os.path.dirname(_HERE), "tests", "goldens")

RECIPES = {
    "st": "training_trajectory.npz",
    "flagship": "training_trajectory_flagship.npz",
    "gram-vgg": "training_trajectory_gramvgg.npz",
    "bb": "training_trajectory_bb.npz",
}

# measured on-chip envelopes (ONCHIP_r04_trajectory.log: worst warm5
# 2.1e-4, gan5_g 1.5e-3, gan5_d 4.4e-3 across the four recipes) with
# ~10x headroom. The gates protect against SEMANTIC divergence (wrong
# optimizer/BN/selection behavior shows at 1e-1+), not bit drift.
GATE_WARM5 = 2e-3     # first-5-step warmup G-loss max rel-err
GATE_GAN5_G = 1.5e-2  # first-5-step GAN G-loss
GATE_GAN5_D = 5e-2    # first-5-step GAN D-loss

# --bf16 replays the same goldens under the SHIPPING bf16 recipe
# (TPU.COMPUTE_DTYPE="bfloat16": xpack trunk auto-selected, Pallas buddy
# select on raw-bf16 scores — the configuration every headline BENCH
# number is measured on). bf16 activations round each step's losses
# (~2^-8 relative per op, compounding across steps), so the gates are
# necessarily looser than the f32 ones; the measured on-chip envelope
# lives in ONCHIP_r05_queue.log (st-bf16 / flagship-bf16 runs: worst
# gated rel-err 2.8e-3 vs gates set with ~10x headroom). They still catch semantic divergence (wrong trunk /
# selection / optimizer behavior shows at ~0.5+ within 5 steps).
GATE_BF16_WARM5 = 4e-2
GATE_BF16_GAN5_G = 1.5e-1
GATE_BF16_GAN5_D = 3e-1


def max_rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    mask = ~np.isnan(a)
    assert (mask == ~np.isnan(np.asarray(b))).all()
    a, b = a[mask], b[mask]
    return float(np.max(np.abs(a - b)
                        / np.maximum(np.maximum(np.abs(a), np.abs(b)), 1e-12)))


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--recipes", nargs="*", default=list(RECIPES),
                   choices=list(RECIPES))
    p.add_argument("--bf16", action="store_true",
                   help="replay under the shipping bf16 recipe (xpack "
                        "trunk + raw-bf16 buddy scores) at the measured "
                        "bf16 gates")
    args_cli = p.parse_args(argv)

    import jax

    backend = jax.default_backend()
    print(f"backend: {backend} devices: {jax.devices()}", file=sys.stderr)

    from crosscheck_training_vs_reference import make_batches, run_jax

    def unpack(data, part):
        prefix = part + "/"
        return {k[len(prefix):]: data[k] for k in data.files
                if k.startswith(prefix)}

    failed = False
    for recipe in args_cli.recipes:
        data = np.load(os.path.join(_GOLDEN_DIR, RECIPES[recipe]))
        warm_n, gan_n, batch, spe, d_int, milestone = (
            int(v) for v in data["meta"])
        args = argparse.Namespace(
            small=True, warmup_steps=warm_n, gan_steps=gan_n, batch=batch,
            steps_per_epoch=spe, d_interval=d_int, milestone=milestone,
            recipe=recipe,
        )
        vgg0 = None
        if recipe == "gram-vgg":
            from crosscheck_training_vs_reference import _make_vgg19_stub

            vgg0 = {k: v.numpy().copy()
                    for k, v in _make_vgg19_stub()().state_dict().items()}
        config_mutate = None
        if args_cli.bf16:
            def config_mutate(config):  # noqa: F811
                config.TPU.COMPUTE_DTYPE = "bfloat16"

        got = run_jax(
            args,
            make_batches(warm_n, batch, 96, seed=1234),
            make_batches(gan_n, batch, 96, seed=5678),
            unpack(data, "g0"), unpack(data, "d0"),
            g_warm=unpack(data, "g_warm"),
            cd0=unpack(data, "cd0") if recipe == "flagship" else None,
            vgg0=vgg0,
            require_cpu=False,
            config_mutate=config_mutate,
        )
        head = slice(0, 5)
        rels = {
            "warm5": max_rel(data["warm_losses"][head],
                             got["warm_losses"][head]),
            "gan5_g": max_rel(data["gan_g_losses"][head],
                              got["gan_g_losses"][head]),
            "gan5_d": max_rel(data["gan_d_losses"][head],
                              got["gan_d_losses"][head]),
            "warm_full": max_rel(data["warm_losses"], got["warm_losses"]),
            "gan_full_g": max_rel(data["gan_g_losses"], got["gan_g_losses"]),
        }
        if args_cli.bf16:
            gates = {"warm5": GATE_BF16_WARM5, "gan5_g": GATE_BF16_GAN5_G,
                     "gan5_d": GATE_BF16_GAN5_D}
        else:
            gates = {"warm5": GATE_WARM5, "gan5_g": GATE_GAN5_G,
                     "gan5_d": GATE_GAN5_D}
        ok = all(rels[k] < gates[k] for k in gates)
        failed |= not ok
        print(json.dumps({
            "metric": "onchip_trajectory_max_rel_err",
            "value": rels["warm5"],
            "unit": ("first-5-step warmup G-loss max rel-err vs the "
                     "executed-torch-reference golden, TPU backend"),
            "config": recipe + ("-bf16" if args_cli.bf16 else ""),
            "backend": backend,
            "detail": {k: round(v, 6) for k, v in rels.items()},
            "gates": gates,
            "ok": ok,
        }))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
