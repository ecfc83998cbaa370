"""Checkpointing.

Two formats:

* **npz weight files** — flat '/'-joined-key archives for simple weight
  exchange (warmup -> GAN warm-start, pretrained content-loss extractors,
  torch-import shims). Counterpart of the reference's `torch.save(
  state_dict)` / tolerant `load_state_dict` (reference utils.py:25-59): the
  loader drops unknown keys and shape-mismatched entries the same way.

* **Orbax train-state checkpoints** — the full GAN state (G/D params +
  batch stats + both Adam states + step/epoch + best metrics) in one tree,
  with the reference's last/best/periodic triple policy (reference
  train.py:207-226) implemented by `CheckpointPolicy`.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import jax

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


# ---------------------------------------------------------------------------
# npz weight exchange

def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_variables_npz(path: str, variables: Any) -> None:
    """Save a flax variables tree (params / batch_stats / ...) to npz."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **_flatten(jax.device_get(variables)))


def load_params_npz(path: str, target: Any | None = None) -> dict:
    """Load an npz variables tree. With `target` given, behaves like the
    reference's tolerant loader (utils.py:25-59): keys absent from the
    target or with mismatched shapes are dropped silently, and the target's
    values are kept for them."""
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    with np.load(path) as data:
        loaded = _unflatten({k: data[k] for k in data.files})
    if target is None:
        return loaded

    target = jax.device_get(target)

    def merge(tgt, src):
        if not isinstance(tgt, dict):
            if isinstance(src, dict):
                return tgt
            return src if np.shape(src) == np.shape(tgt) else tgt
        return {
            k: (merge(v, src[k]) if isinstance(src, dict) and k in src else v)
            for k, v in tgt.items()
        }

    return merge(target, loaded)


# ---------------------------------------------------------------------------
# Orbax train-state checkpoints

class CheckpointPolicy:
    """last / best / periodic checkpoint policy (reference train.py:207-226):
    `last` is overwritten every epoch; `best` when PSNR AND SSIM both
    improve; `epoch{N}` every CHECKPOINT_INTERVAL epochs (and only for
    epoch > 0, matching the reference's `0 < epoch` guard)."""

    def __init__(self, results_dir: str, interval: int = 100):
        self.results_dir = os.path.abspath(results_dir)
        self.interval = interval
        self.best_psnr = 0.0
        self.best_ssim = 0.0
        os.makedirs(self.results_dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer() if _HAS_ORBAX else None

    def _save(self, name: str, state: Any) -> None:
        path = os.path.join(self.results_dir, name)
        if self._ckpt is not None:
            self._ckpt.save(path, jax.device_get(state), force=True)
            self._ckpt.wait_until_finished()
        else:  # pragma: no cover
            save_variables_npz(path + ".npz", state)

    def save_epoch(self, state: Any, epoch: int, psnr: float, ssim: float) -> bool:
        """Apply the triple policy for a finished epoch; returns is_best."""
        self._save("last", state)
        is_best = self.best_psnr < psnr and self.best_ssim < ssim
        if is_best:
            self._save("best", state)
            self.best_psnr = psnr
            self.best_ssim = ssim
        if 0 < epoch and epoch % self.interval == 0:
            self._save(f"epoch{epoch}", state)
        return is_best

    def restore(self, name: str, target: Any) -> Any:
        path = os.path.join(self.results_dir, name)
        if self._ckpt is not None:
            return self._ckpt.restore(path, target=jax.device_get(target))
        return load_params_npz(path + ".npz", target)  # pragma: no cover

    def restore_latest(self, target: Any) -> Any | None:
        """Auto-restore `last` if present (elastic-recovery improvement over
        the reference, which never auto-loads *_last; SURVEY.md §5)."""
        path = os.path.join(self.results_dir, "last")
        if os.path.exists(path):
            return self.restore("last", target)
        return None
