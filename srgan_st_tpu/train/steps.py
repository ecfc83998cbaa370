"""Jitted training steps.

The reference's per-batch loop (train.py:116-164) is re-expressed as two
compiled, donated-buffer step functions — the SURVEY.md §7 "GAN step
structure under jit" design:

  * `g_step(state, gt_u8)` — on-device /255 + bicubic degradation, generator
    forward, the weighted criterion sum (adversarial handled by name, like
    train.py:135-138), gradients w.r.t. G only (`stop_gradient` semantics
    replace the reference's requires_grad freezing dance, train.py:125-126),
    Adam update, BN batch-stat updates for G *and* D (torch updates D's
    running stats during the G forward in train mode — matched).

  * `d_step(state, gt, sr)` — the every-`D_UPDATE_INTERVAL` discriminator
    update (train.py:149-164): D(gt) vs smoothed real, D(stop_grad(sr)) vs
    fake, sequential BN stat updates, Adam update. Invoked from the host on
    the interval, exactly like the reference's `if batch_num % interval`.

Data parallelism: callers `device_put` the state replicated and batches
sharded over the ('data',) mesh axis; GSPMD inserts the psum gradient
reductions and the cross-replica BatchNorm statistics automatically.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from srgan_st_tpu.losses.functions import adversarial_loss
from srgan_st_tpu.ops.resize import resize_bicubic


class GANTrainState(struct.PyTreeNode):
    g_params: Any
    g_stats: Any
    g_opt: Any
    d_params: Any = None
    d_stats: Any = None
    d_opt: Any = None
    step: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), jnp.int32))


def multistep_lr(base_lr: float, milestones_steps: list[int], gamma: float) -> Callable:
    """Exact MultiStepLR semantics (reference train.py:78-87, milestones in
    *steps*): lr = base * gamma^(#milestones passed)."""
    if not milestones_steps:
        return lambda count: base_lr
    bounds = jnp.asarray(sorted(milestones_steps))

    def schedule(count):
        return base_lr * gamma ** jnp.sum(count >= bounds)

    return schedule


def make_optimizer(base_lr, beta1, beta2, eps, weight_decay, milestones_steps, gamma,
                   flatten=False):
    """Adam with the reference's hyperparameters — note eps=1e-4, not the
    torch default (reference config.py:107,114).

    `flatten` wraps the update in optax.flatten (one fused Adam step over a
    concatenated vector). MEASURED on v5e (k=20 chunked GAN step, bf16):
    it LOSES 0.28 ms/step against XLA's per-leaf fusions once the conv3
    shuffle-fusion is on (3.635 vs 3.359 ms) — the flatten gather/scatter
    costs more than the launch overhead it saves — so it stays off by
    default."""
    sched = multistep_lr(base_lr, milestones_steps, gamma)
    if weight_decay:
        tx = optax.adamw(sched, b1=beta1, b2=beta2, eps=eps, weight_decay=weight_decay)
    else:
        tx = optax.adam(sched, b1=beta1, b2=beta2, eps=eps)
    return optax.flatten(tx) if flatten else tx


def make_g_optimizer(config, steps_per_epoch: int, milestones: bool = True):
    ms = [m * steps_per_epoch for m in config.SCHEDULER.MILESTONES] if milestones else []
    return make_optimizer(
        config.SOLVER.G_BASE_LR, config.SOLVER.G_BETA1, config.SOLVER.G_BETA2,
        config.SOLVER.G_EPS, config.SOLVER.G_WEIGHT_DECAY, ms, config.SCHEDULER.GAMMA,
    )


def make_d_optimizer(config, steps_per_epoch: int):
    """D's Adam + MultiStepLR. The schedule count in optax counts THIS
    optimizer's updates — i.e. D updates, which happen only once per
    D_UPDATE_INTERVAL batches (train.py:149) — so epoch milestones must be
    converted to D-UPDATE counts, not global steps: ceil(spe/interval)
    D updates happen per epoch (batch_num resets each epoch, and batch 0
    always updates). Converting to global steps (the G formula) would fire
    D's LR decay ~interval-times too late — a real divergence the
    trajectory-parity harness caught against the executed reference
    (reference train.py:79-88,186-188: MultiStepLR stepped per epoch,
    decaying both optimizers at the same wall-clock epoch)."""
    d_updates_per_epoch = -(-steps_per_epoch // config.SOLVER.D_UPDATE_INTERVAL)
    ms = [m * d_updates_per_epoch for m in config.SCHEDULER.MILESTONES]
    return make_optimizer(
        config.SOLVER.D_BASE_LR, config.SOLVER.D_BETA1, config.SOLVER.D_BETA2,
        config.SOLVER.D_EPS, config.SOLVER.D_WEIGHT_DECAY, ms, config.SCHEDULER.GAMMA,
    )


# ---------------------------------------------------------------------------

def _prepare_batch(gt, config, key=None, augment=False):
    """uint8 NHWC GT batch -> (gt, lr) float32 pair, on device.

    Matches the reference data path (dataset.py:23-32): /255, then
    MATLAB-bicubic x(1/upscale) with quantization. TPU additions beyond
    the reference (which pre-tiles patches at exactly the GT size and has
    no augmentation, prepare_dataset.py:50-68 / dataset.py:9-35):

      * when the incoming tiles are LARGER than DATA.GT_IMAGE_SIZE (e.g.
        `prepare_dataset --output_size 120`), a per-sample random
        GT_IMAGE_SIZE^2 crop is taken on device (uint8, pre-normalize);
      * DATA.AUGMENT applies the full 8-way dihedral group (horizontal
        flip x rot90^k) per sample, off by default for reference parity.

    Both draws derive from `key` — the callers pass the (DATA.SEED,
    state.step)-keyed stream, so the crop/augment choices are
    deterministic across checkpoint resume."""
    s = int(config.DATA.GT_IMAGE_SIZE)
    k_crop = k_aug = None
    if key is not None:
        k_crop, k_aug = jax.random.split(key)
    if gt.shape[1] != s or gt.shape[2] != s:
        if k_crop is None:
            raise ValueError(
                f"tile size {gt.shape[1:3]} != GT_IMAGE_SIZE {s} requires a key"
            )
        b, ch = gt.shape[0], gt.shape[-1]
        kh, kw = jax.random.split(k_crop)
        oh = jax.random.randint(kh, (b,), 0, gt.shape[1] - s + 1)
        ow = jax.random.randint(kw, (b,), 0, gt.shape[2] - s + 1)
        gt = jax.vmap(
            lambda img, y, x: jax.lax.dynamic_slice(img, (y, x, 0), (s, s, ch))
        )(gt, oh, ow)
    if gt.dtype == jnp.uint8:
        gt = gt.astype(jnp.float32) / 255.0
    if augment:
        kf, kr = jax.random.split(k_aug)
        b = gt.shape[0]
        flip = jax.random.bernoulli(kf, shape=(b,))
        gt = jnp.where(flip[:, None, None, None], gt[:, :, ::-1], gt)
        # per-sample rot90^k via a where-chain (no (4, B, ...) stack+gather)
        rot = jax.random.randint(kr, (b,), 0, 4)[:, None, None, None]
        for r in (1, 2, 3):
            gt = jnp.where(rot == r, jnp.rot90(gt, r, axes=(1, 2)), gt)
    lr = resize_bicubic(gt, 1.0 / config.DATA.UPSCALE_FACTOR, method="matlab")
    return gt, lr


def _aug_key(config, step):
    """Per-step augmentation key derived from (DATA.SEED, state.step) —
    deterministic across resumes, no key-threading through the drivers.

    Under the explicit-SPMD (shard_map) step the shard index is folded in
    so each shard draws independent crop/augment decisions for its local
    samples (still deterministic)."""
    key = jax.random.fold_in(jax.random.key(config.DATA.SEED + 7), step)
    axis = config.TPU.get("SHARD_MAP_AXIS")
    if axis:
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
    return key


def _pmean_if_sharded(config, *trees):
    """lax.pmean over the shard_map axis (no-op in the GSPMD path, where
    XLA derives the collectives from shardings instead)."""
    axis = config.TPU.get("SHARD_MAP_AXIS")
    if not axis:
        return trees if len(trees) > 1 else trees[0]
    out = tuple(jax.lax.pmean(t, axis) for t in trees)
    return out if len(out) > 1 else out[0]


def make_warmup_step(config, g_model, criterions, g_tx):
    """Generator-only pretraining step (reference warmup.py:74-96)."""
    augment = bool(config.DATA.AUGMENT)

    def warmup_step(state: GANTrainState, gt_u8):
        gt, lr = _prepare_batch(
            gt_u8, config, _aug_key(config, state.step), augment
        )

        def loss_fn(g_params):
            sr, mut = g_model.apply(
                {"params": g_params, "batch_stats": state.g_stats},
                lr, train=True, mutable=["batch_stats"],
            )
            total = 0.0
            values = {}
            for name, (fn, weight) in criterions.items():
                term = fn(sr, gt) * weight
                values[f"G_{name}"] = term
                total = total + term
            return total, (values, mut["batch_stats"])

        (total, (values, g_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.g_params
        )
        grads, total, values = _pmean_if_sharded(config, grads, total, values)
        updates, g_opt = g_tx.update(grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)
        metrics = dict(values, G_Loss=total)
        return (
            state.replace(g_params=g_params, g_stats=g_stats, g_opt=g_opt,
                          step=state.step + 1),
            metrics,
        )

    return warmup_step


def make_gan_steps(config, g_model, d_model, criterions, g_tx, d_tx):
    """Build (g_step, d_step) for adversarial training (train.py:116-164)."""
    real_label = 1.0 - config.EXP.LABEL_SMOOTHING
    augment = bool(config.DATA.AUGMENT)
    has_adversarial = any(fn is None for fn, _ in criterions.values())

    def g_step(state: GANTrainState, gt_u8):
        # Augmentation keys derive from state.step, so no key threading is
        # needed. The D step below intentionally sees the UNAUGMENTED gt:
        # D scores real and fake batches independently (no pairing), and
        # flips/rot90 don't change the real-image distribution.
        gt, lr = _prepare_batch(
            gt_u8, config, _aug_key(config, state.step), augment
        )

        def loss_fn(g_params):
            sr, mut = g_model.apply(
                {"params": g_params, "batch_stats": state.g_stats},
                lr, train=True, mutable=["batch_stats"],
            )
            d_stats = state.d_stats
            total = 0.0
            values = {}
            for name, (fn, weight) in criterions.items():
                if fn is None:  # Adversarial (train.py:135-136)
                    logits, d_mut = d_model.apply(
                        {"params": state.d_params, "batch_stats": d_stats},
                        sr, train=True, mutable=["batch_stats"],
                    )
                    term = adversarial_loss(logits, real_label) * weight
                    d_stats = d_mut["batch_stats"]
                else:
                    term = fn(sr, gt) * weight
                values[f"G_{name}"] = term
                total = total + term
            return total, (values, mut["batch_stats"], d_stats, sr)

        (total, (values, g_stats, d_stats, sr)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.g_params)
        grads, total, values = _pmean_if_sharded(config, grads, total, values)
        updates, g_opt = g_tx.update(grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)
        metrics = dict(values, G_Loss=total)
        new_state = state.replace(
            g_params=g_params, g_stats=g_stats, g_opt=g_opt,
            d_stats=d_stats if has_adversarial else state.d_stats,
            step=state.step + 1,
        )
        return new_state, jax.lax.stop_gradient(sr), metrics

    def d_step(state: GANTrainState, gt_u8, sr):
        # D sees unaugmented real patches (any random crop of a real tile
        # is a real patch; its key differs from g_step's by the step bump)
        gt, _ = _prepare_batch(gt_u8, config, _aug_key(config, state.step))
        sr = jax.lax.stop_gradient(sr)

        def loss_fn(d_params):
            pred_gt, mut1 = d_model.apply(
                {"params": d_params, "batch_stats": state.d_stats},
                gt, train=True, mutable=["batch_stats"],
            )
            loss_real = adversarial_loss(pred_gt, real_label)
            pred_sr, mut2 = d_model.apply(
                {"params": d_params, "batch_stats": mut1["batch_stats"]},
                sr, train=True, mutable=["batch_stats"],
            )
            loss_fake = adversarial_loss(pred_sr, 0.0)
            return loss_real + loss_fake, (mut2["batch_stats"], pred_gt, pred_sr)

        (d_loss, (d_stats, pred_gt, pred_sr)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.d_params)
        grads, d_loss = _pmean_if_sharded(config, grads, d_loss)
        updates, d_opt = d_tx.update(grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, updates)
        # pmean the pre-sigmoid means so sharded == global semantics
        # (sigmoid(global mean), matching the reference train.py:174-179)
        mean_gt, mean_sr = _pmean_if_sharded(
            config, pred_gt.mean(), pred_sr.mean()
        )
        metrics = {
            "D_Loss": d_loss,
            "D(GT)_Probability": jax.nn.sigmoid(mean_gt),
            "D(SR)_Probability": jax.nn.sigmoid(mean_sr),
        }
        return (
            state.replace(d_params=d_params, d_stats=d_stats, d_opt=d_opt),
            metrics,
        )

    return g_step, d_step


# ---------------------------------------------------------------------------
# Chunked (device-side-loop) steps.
#
# Per-dispatch overhead for a ~700-leaf GANTrainState pytree is ~5 ms on
# this host — an order of magnitude more than the <1 ms step compute. A
# `lax.scan` over a chunk of batches amortizes the dispatch to once per
# chunk. Chunk = D_UPDATE_INTERVAL keeps exact reference semantics: the
# D update and the TB log row both happen at batch 0 of every
# 100-batch window (reference train.py:149,169).

def make_warmup_chunk_step(config, g_model, criterions, g_tx):
    step = make_warmup_step(config, g_model, criterions, g_tx)

    def chunk_step(state: GANTrainState, gt_chunk):
        """gt_chunk: (K, B, S, S, 3) uint8 -> (state, metrics of batch 0).

        The scan carry holds only the leaves the warmup step mutates —
        loop-invariant state (D params/opt) rides as closed-over constants,
        not per-iteration carry copies."""
        state, metrics0 = step(state, gt_chunk[0])

        def body(carry, gt):
            st = state.replace(
                g_params=carry[0], g_stats=carry[1], g_opt=carry[2], step=carry[3]
            )
            st, _ = step(st, gt)
            return (st.g_params, st.g_stats, st.g_opt, st.step), None

        carry, _ = jax.lax.scan(
            body, (state.g_params, state.g_stats, state.g_opt, state.step),
            gt_chunk[1:],
        )
        state = state.replace(
            g_params=carry[0], g_stats=carry[1], g_opt=carry[2], step=carry[3]
        )
        return state, metrics0

    return chunk_step


def make_gan_chunk_step(config, g_model, d_model, criterions, g_tx, d_tx):
    g_step, d_step = make_gan_steps(config, g_model, d_model, criterions, g_tx, d_tx)

    def chunk_step(state: GANTrainState, gt_chunk, do_d_update: bool = True):
        """gt_chunk: (K, B, S, S, 3) uint8. Runs K generator updates and —
        when do_d_update (the chunk starts on a D_UPDATE_INTERVAL boundary) —
        ONE discriminator update on batch 0, reusing its sr (reference
        train.py:149-164). Returns metrics of batch 0 (the logged batch).
        `do_d_update` must be static under jit (static_argnums=2)."""
        state, sr0, g_metrics = g_step(state, gt_chunk[0])
        d_metrics = {}
        if do_d_update:
            state, d_metrics = d_step(state, gt_chunk[0], sr0)

        # Reduced scan carry: only what the G step mutates. D params are
        # read by the adversarial term but never written inside the scan —
        # closing over them keeps them as loop invariants instead of
        # hundreds of MB of per-iteration carry copies; D's optimizer state
        # never enters the loop at all.
        def body(carry, gt):
            st = state.replace(
                g_params=carry[0], g_stats=carry[1], g_opt=carry[2],
                d_stats=carry[3], step=carry[4],
            )
            st, _, _ = g_step(st, gt)
            return (st.g_params, st.g_stats, st.g_opt, st.d_stats, st.step), None

        carry, _ = jax.lax.scan(
            body,
            (state.g_params, state.g_stats, state.g_opt, state.d_stats, state.step),
            gt_chunk[1:],
        )
        state = state.replace(
            g_params=carry[0], g_stats=carry[1], g_opt=carry[2],
            d_stats=carry[3], step=carry[4],
        )
        return state, {**g_metrics, **d_metrics}

    return chunk_step


# ---------------------------------------------------------------------------

def create_generator_state(config, g_model, g_tx, rng=None) -> GANTrainState:
    rng = rng if rng is not None else jax.random.key(config.DATA.SEED)
    lr_size = config.DATA.GT_IMAGE_SIZE // config.DATA.UPSCALE_FACTOR
    variables = g_model.init(
        rng, jnp.zeros((1, lr_size, lr_size, config.MODEL.G_IN_CHANNEL)), train=False
    )
    return GANTrainState(
        g_params=variables["params"],
        g_stats=variables["batch_stats"],
        g_opt=g_tx.init(variables["params"]),
    )


def create_gan_state(config, g_model, d_model, g_tx, d_tx, rng=None) -> GANTrainState:
    rng = rng if rng is not None else jax.random.key(config.DATA.SEED)
    g_rng, d_rng = jax.random.split(rng)
    state = create_generator_state(config, g_model, g_tx, g_rng)
    size = config.DATA.GT_IMAGE_SIZE
    d_vars = d_model.init(
        d_rng, jnp.zeros((1, size, size, config.MODEL.D_IN_CHANNEL)), train=False
    )
    return state.replace(
        d_params=d_vars["params"],
        d_stats=d_vars["batch_stats"],
        d_opt=d_tx.init(d_vars["params"]),
    )
