"""Numerical-sanity utilities.

The reference has no sanitizers (SURVEY.md §5). GAN losses (especially the
structure-tensor pipeline with its clamp/eps hacks, reference
utils.py:262,275) are the NaN-prone spots; these helpers catch blowups at
the step boundary without slowing the hot path when disabled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def check_finite_tree(tree, name: str = "tree") -> None:
    """Host-side assertion that every leaf is finite (call on fetched
    metrics/params at log boundaries; forces a sync — keep off the hot
    path)."""
    import numpy as np

    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")


def nan_guard(step_fn):
    """Wrap a jitted step so metrics are checked with jax.debug inside the
    computation (TPU-side, no host sync): prints a warning line when any
    metric goes non-finite. Enable during loss bring-up."""

    def wrapped(state, *args, **kwargs):
        out = step_fn(state, *args, **kwargs)
        metrics = out[-1]
        flat = [v for v in jax.tree.leaves(metrics)]
        finite = jnp.all(jnp.stack([jnp.all(jnp.isfinite(v)) for v in flat]))
        jax.debug.callback(
            lambda ok: None if ok else print("WARNING: non-finite training metrics"),
            finite,
        )
        return out

    return wrapped
