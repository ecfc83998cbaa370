"""Criterion registry: builds the weighted loss set a train step closes over.

Mirrors the reference's CRITERIONS / CRITERION_WEIGHTS registry and its
add/remove mutators (reference config.py:71-93,122-131; consumed by
train.py:131-141). Specs are dicts {"kind": ..., **kwargs}; `kind` selects
one of the pure functions in srgan_st_tpu.losses.functions.

"Adversarial" is special-cased by the train step (it needs the live
discriminator), exactly like the reference's `if name == 'Adversarial'`
branch (train.py:135-136); build_criterions skips it and the step handles
it by name.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax

from srgan_st_tpu.losses import functions as F


def _build_content_vgg(config, spec):
    import jax.numpy as jnp

    from srgan_st_tpu.models.vgg import VGG19Features, load_vgg19_npz

    layer_weights = dict(config.MODEL.G_LOSS.VGG19_LAYERS)
    taps = tuple(layer_weights)
    # VGG runs at the step's compute dtype (bf16 halves its activation
    # traffic; f32 default keeps strict reference parity)
    model = VGG19Features(taps=taps, dtype=jnp.dtype(config.TPU.COMPUTE_DTYPE))
    weights_path = spec.get("weights", config.MODEL.G_LOSS.VGG19_WEIGHTS)
    try:
        variables = load_vgg19_npz(weights_path, taps)
    except FileNotFoundError:
        if not spec.get("allow_random_init", False):
            raise FileNotFoundError(
                f"VGG19 weights not found at '{weights_path}'. Convert the "
                "torchvision IMAGENET1K_V1 checkpoint once with "
                "tools/convert_vgg19.py, or set spec['allow_random_init']=True "
                "for testing."
            )
        import jax.numpy as jnp

        variables = model.init(jax.random.key(0), jnp.zeros((1, 96, 96, 3)))
    # spec["pair"] = True selects the batch-concatenated frozen-pair forward
    # (make_vgg19_frozen_pair: one batch-32 pass + hand-written sr-only
    # backward). Measured on-chip 2026-08-19 (ONCHIP_r03.log): pair 2,642 vs
    # two-forward 2,680 patches/s/chip in the gram-vgg recipe — XLA already
    # overlaps the two batch-16 forwards well enough that halving the op
    # count doesn't pay, so the default is the two-forward autodiff path.
    pair = spec.get("pair", False)
    if pair:
        from srgan_st_tpu.models.vgg import make_vgg19_frozen_pair

        pair_fn = make_vgg19_frozen_pair(
            variables, taps, jnp.dtype(config.TPU.COMPUTE_DTYPE)
        )
        return functools.partial(
            F.content_loss_vgg,
            vgg_pair=pair_fn,
            layer_weights=layer_weights,
            criterion=spec.get("criterion", "mse"),
        )
    vgg_apply = lambda x: model.apply(variables, x)  # noqa: E731
    return functools.partial(
        F.content_loss_vgg,
        vgg_apply=vgg_apply,
        layer_weights=layer_weights,
        criterion=spec.get("criterion", "mse"),
        remat=spec.get("remat", False),
    )


def _build_content_disc(config, spec):
    import jax.numpy as jnp

    from srgan_st_tpu.models.discriminator import Discriminator
    from srgan_st_tpu.train.checkpoint import load_params_npz

    layer_weights = dict(config.MODEL.G_LOSS.DISC_FEATURES_LOSS_LAYERS)
    taps = tuple(layer_weights)
    model = Discriminator.from_config(config)
    weights_path = spec.get("weights", config.MODEL.G_LOSS.DISC_FEATURES_WEIGHTS)
    if weights_path:
        variables = load_params_npz(weights_path)
    else:
        # The reference instantiates a *fresh random* discriminator unless
        # weights are loaded externally (loss.py:263) — matched, with a
        # fixed seed for reproducibility.
        size = config.DATA.GT_IMAGE_SIZE
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, size, size, 3)), train=False
        )
    # .eval() semantics (loss.py:276): running statistics, no stat updates.
    d_apply = lambda x: model.apply(variables, x, train=False, taps=taps)  # noqa: E731
    return functools.partial(
        F.content_loss_discriminator,
        d_apply=d_apply,
        layer_weights=layer_weights,
        criterion=spec.get("criterion", "mse"),
    )


_SIMPLE_KINDS = {
    "pixel": F.pixel_loss,
    "best_buddy": F.best_buddy_loss,
    "gram": F.gram_loss,
    "patchwise_st": F.patchwise_st_loss,
    "st": F.st_loss,
}

# Default spec-kind each canonical criterion name maps to, so configs can
# simply list names (reference names, config.py:77-86).
CANONICAL_KINDS = {
    "Adversarial": "adversarial",
    "Pixel": "pixel",
    "ContentVGG": "content_vgg",
    "ContentDiscriminator": "content_disc",
    "BestBuddy": "best_buddy",
    "Gram": "gram",
    "PatchwiseST": "patchwise_st",
    "ST": "st",
}


def build_one(config, name: str, spec: dict) -> Callable | None:
    """Build a single criterion callable fn(sr, gt) -> scalar, or None for
    the adversarial marker (handled by the train step)."""
    spec = dict(spec)
    kind = spec.pop("kind", CANONICAL_KINDS.get(name))
    if kind is None:
        raise KeyError(f"criterion '{name}' has no kind and is not canonical")
    if kind == "adversarial":
        return None
    if kind == "content_vgg":
        return _build_content_vgg(config, spec)
    if kind == "content_disc":
        return _build_content_disc(config, spec)
    if kind in _SIMPLE_KINDS:
        spec.pop("allow_random_init", None)
        # loss pipeline runs at the step's compute dtype unless the spec
        # pins one ("dtype": None keeps strict f32); f32 default is a no-op
        spec.setdefault("dtype", config.TPU.COMPUTE_DTYPE)
        if kind in ("best_buddy", "gram", "patchwise_st") and "pallas" not in spec:
            # the Pallas buddy-select kernel is opaque to GSPMD sharding
            # propagation: keep it only where it stays per-shard (single
            # device, or the explicit shard_map path); None = the
            # backend-based auto in losses/functions.py
            gspmd_safe = (
                config.TPU.get("SHARD_MAP_AXIS") or jax.device_count() == 1
            )
            spec["pallas"] = None if gspmd_safe else False
        return functools.partial(_SIMPLE_KINDS[kind], **spec)
    raise NotImplementedError(f"criterion kind '{kind}' has not been implemented.")


def build_criterions(config) -> dict[str, tuple[Callable | None, float]]:
    """name -> (fn | None-for-adversarial, weight) for the GAN phase."""
    out = {}
    for name, spec in config.MODEL.G_LOSS.CRITERIONS.items():
        weight = config.MODEL.G_LOSS.CRITERION_WEIGHTS.get(name, 1.0)
        out[name] = (build_one(config, name, spec), float(weight))
    return out


def build_warmup_criterions(config) -> dict[str, tuple[Callable | None, float]]:
    """name -> (fn, weight) for the warmup phase (reference config.py:88-93)."""
    out = {}
    for name, spec in config.MODEL.G_LOSS.WARMUP_CRITERIONS.items():
        weight = config.MODEL.G_LOSS.WARMUP_WEIGHTS.get(name, 1.0)
        out[name] = (build_one(config, name, spec), float(weight))
    return out
