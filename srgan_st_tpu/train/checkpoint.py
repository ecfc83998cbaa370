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


def save_pytree_npz(path: str, tree: Any) -> None:
    """Save ANY pytree (train states included) to npz, keyed by tree path.

    ~0.02 s for the full generator state vs ~1-150 s for an orbax
    StandardCheckpointer save of the same tree on this host — npz is the
    default train-state format; orbax remains available for sharded
    multi-host state (CheckpointPolicy(use_orbax=True))."""
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(jax.device_get(tree))[0]
    flat = {jax.tree_util.keystr(p): np.asarray(v) for p, v in leaves_with_paths}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def load_pytree_npz(path: str, target: Any) -> Any:
    """Restore a pytree saved by save_pytree_npz into `target`'s structure."""
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(
        jax.device_get(target)
    )
    leaves = []
    for p, old in paths_and_leaves:
        key = jax.tree_util.keystr(p)
        if key not in flat:
            raise KeyError(f"checkpoint {path} missing leaf {key}")
        old = np.asarray(old)
        if flat[key].shape != old.shape:
            # same tree, different hyperparameters (e.g. G_N_CHANNEL
            # changed under the same EXP.NAME): raise here so
            # restore_latest skips the checkpoint with a warning instead
            # of letting the jitted step fail with an opaque shape error
            raise ValueError(
                f"checkpoint {path} leaf {key} has shape "
                f"{flat[key].shape}, target expects {old.shape}"
            )
        leaves.append(flat[key].astype(old.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


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

    def __init__(self, results_dir: str, interval: int = 100,
                 use_orbax: bool = False):
        self.results_dir = os.path.abspath(results_dir)
        self.interval = interval
        self.best_psnr = 0.0
        self.best_ssim = 0.0
        os.makedirs(self.results_dir, exist_ok=True)
        # persist best-metric tracking so a resumed run can't overwrite
        # `best` with a worse model (the train state itself carries no
        # best-metric fields)
        self._meta_path = os.path.join(self.results_dir, "_policy.json")
        if os.path.exists(self._meta_path):
            import json

            with open(self._meta_path) as f:
                meta = json.load(f)
            self.best_psnr = float(meta.get("best_psnr", 0.0))
            self.best_ssim = float(meta.get("best_ssim", 0.0))
        # npz pytree saves by default: ~0.02 s vs orbax's ~1 s/epoch (and a
        # ~2.5 min first save) for single-host state; orbax opt-in for
        # multi-host checkpoints (config.EXP.ORBAX_CHECKPOINTS)
        self._ckpt = ocp.StandardCheckpointer() if (use_orbax and _HAS_ORBAX) else None

    @property
    def collective(self) -> bool:
        """True when `save_epoch` must be invoked by EVERY process: orbax
        saves are collective in a multi-process runtime (the save barriers
        all processes via sync_global_processes, even though only the
        primary host writes replicated data). The npz path is plain
        coordinator-only file IO."""
        if self._ckpt is None:
            return False
        return jax.process_count() > 1

    def _save(self, name: str, state: Any) -> None:
        path = os.path.join(self.results_dir, name)
        if self._ckpt is not None:
            self._ckpt.save(path, jax.device_get(state), force=True)
            self._ckpt.wait_until_finished()
        else:
            save_pytree_npz(path + ".state.npz", state)

    def save_epoch(self, state: Any, epoch: int, psnr: float, ssim: float) -> bool:
        """Apply the triple policy for a finished epoch; returns is_best.

        Multi-process with orbax: call from ALL processes (see
        `collective`). Eval runs coordinator-only (non-coordinators pass
        NaN), so the metrics are broadcast from process 0 first — every
        process then takes the same is-best branch, keeping the collective
        `best` save consistent."""
        if self.collective:
            from jax.experimental import multihost_utils

            psnr, ssim = (float(v) for v in multihost_utils.broadcast_one_to_all(
                np.asarray([psnr, ssim], np.float32)
            ))
        self._save("last", state)
        is_best = self.best_psnr < psnr and self.best_ssim < ssim
        if is_best:
            self._save("best", state)
            self.best_psnr = psnr
            self.best_ssim = ssim
            if jax.process_index() == 0:
                import json

                with open(self._meta_path, "w") as f:
                    json.dump(
                        {"best_psnr": psnr, "best_ssim": ssim, "epoch": epoch}, f
                    )
        if 0 < epoch and epoch % self.interval == 0:
            self._save(f"epoch{epoch}", state)
        return is_best

    def restore(self, name: str, target: Any) -> Any:
        path = os.path.join(self.results_dir, name)
        if self._ckpt is not None:
            return self._ckpt.restore(path, target=jax.device_get(target))
        return load_pytree_npz(path + ".state.npz", target)

    def restore_latest(self, target: Any) -> Any | None:
        """Auto-restore `last` if present (elastic-recovery improvement over
        the reference, which never auto-loads *_last; SURVEY.md §5).
        Incompatible checkpoints (e.g. a warmup-phase state found by a GAN
        run sharing the results dir) are skipped with a warning instead of
        aborting the run."""
        path = os.path.join(self.results_dir, "last")
        if os.path.exists(path) or os.path.exists(path + ".state.npz"):
            try:
                return self.restore("last", target)
            except (KeyError, ValueError) as e:
                print(
                    f"skipping incompatible 'last' checkpoint in "
                    f"{self.results_dir}: {e}"
                )
        return None
