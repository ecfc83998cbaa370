"""Adversarial (GAN) training driver.

Mirrors reference train.py:16-226: G and D Adam optimizers (eps=1e-4),
MultiStep LR halving at epoch 10 for both, one-sided label smoothing, the
criterion-sum generator update every batch, the discriminator update every
`SOLVER.D_UPDATE_INTERVAL` batches (reusing the G step's sr, train.py:158),
per-epoch validation, TensorBoard scalars with the reference's names, the
warmup warm-start flags, and the g/d last/best/epoch checkpoint policy.

TPU-native: two jitted donated step functions over a data-parallel mesh
(design notes in srgan_st_tpu/train/steps.py).
"""

from __future__ import annotations

import os

import jax

from srgan_st_tpu.data.pipeline import make_train_source
from srgan_st_tpu.eval.validate import make_generator_apply, validate
from srgan_st_tpu.losses.registry import build_criterions
from srgan_st_tpu.models.discriminator import Discriminator
from srgan_st_tpu.models.generator import Generator
from srgan_st_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from srgan_st_tpu.train.checkpoint import (
    CheckpointPolicy,
    load_params_npz,
    save_variables_npz,
)
from srgan_st_tpu.train.logging import ExperimentWriter
from srgan_st_tpu.train.steps import (
    create_gan_state,
    make_d_optimizer,
    make_g_optimizer,
    make_gan_steps,
)
from srgan_st_tpu.train.utils import make_test_pairs


def train(config):
    rng = jax.random.key(config.DATA.SEED)

    mesh = make_mesh(config)
    source = make_train_source(config)
    steps_per_epoch = len(source)

    g_model = Generator.from_config(config)
    d_model = Discriminator.from_config(config)
    g_tx = make_g_optimizer(config, steps_per_epoch)
    d_tx = make_d_optimizer(config, steps_per_epoch)
    criterions = build_criterions(config)

    state = create_gan_state(config, g_model, d_model, g_tx, d_tx, rng)

    # Warm-start from warmup weights (reference train.py:90-96); tolerant
    # merge drops mismatched keys like the reference's load_state_dict shim.
    if config.MODEL.G_CONTINUE_FROM_WARMUP:
        loaded = load_params_npz(
            config.MODEL.G_WARMUP_WEIGHTS,
            {"params": state.g_params, "batch_stats": state.g_stats},
        )
        state = state.replace(g_params=loaded["params"], g_stats=loaded["batch_stats"])
    if config.MODEL.D_CONTINUE_FROM_WARMUP:
        loaded = load_params_npz(
            config.MODEL.D_WARMUP_WEIGHTS,
            {"params": state.d_params, "batch_stats": state.d_stats},
        )
        state = state.replace(d_params=loaded["params"], d_stats=loaded["batch_stats"])

    state = jax.device_put(state, replicated(mesh))

    g_step_fn, d_step_fn = make_gan_steps(config, g_model, d_model, criterions, g_tx, d_tx)
    g_step_fn = jax.jit(g_step_fn, donate_argnums=0)
    d_step_fn = jax.jit(d_step_fn, donate_argnums=0)

    writer = ExperimentWriter(config)
    results_dir = f"results/{config.EXP.NAME}"
    policy = CheckpointPolicy(results_dir, config.G_CHECKPOINT_INTERVAL)
    test_pairs = make_test_pairs(config)

    # Optional auto-resume (improvement over the reference, which restarts
    # the epoch counter but never reloads *_last; SURVEY.md §5).
    if config.EXP.START_EPOCH > 0:
        restored = policy.restore_latest(state)
        if restored is not None:
            state = jax.device_put(restored, replicated(mesh))

    d_metrics = {}
    for epoch in range(config.EXP.START_EPOCH, config.EXP.N_EPOCHS):
        print(f"Beginning train epoch: {epoch+1}")

        for batch_num, gt_batch in enumerate(source.epoch()):
            batch = shard_batch(gt_batch, mesh)
            state, sr, g_metrics = g_step_fn(state, batch)

            # Discriminator update on the interval (reference train.py:149)
            if batch_num % config.SOLVER.D_UPDATE_INTERVAL == 0:
                state, d_metrics = d_step_fn(state, batch, sr)

            if batch_num % config.LOG_TRAIN_PERIOD != 0:
                continue
            g_vals = jax.device_get(g_metrics)
            d_vals = jax.device_get(d_metrics)
            batches_done = batch_num + epoch * steps_per_epoch
            for name, val in {**g_vals, **d_vals}.items():
                writer.add_scalar(f"Train/{name}", val, batches_done)
            print(
                f"[Epoch {epoch+1}/{config.EXP.N_EPOCHS}] "
                f"[Batch {batch_num}/{steps_per_epoch}] "
                f"[D loss: {float(d_vals.get('D_Loss', float('nan')))}] "
                f"[G loss: {float(g_vals['G_Loss'])}]"
            )

        # ---- validate (reference train.py:191-201)
        g_variables = jax.device_get(
            {"params": state.g_params, "batch_stats": state.g_stats}
        )
        psnr, ssim = validate(
            make_generator_apply(config, g_variables), test_pairs, config
        )
        if epoch % config.LOG_VALIDATION_PERIOD == 0:
            print(f"[Test: {epoch+1}/{config.EXP.N_EPOCHS}] [PSNR: {psnr}] [SSIM: {ssim}]")
        writer.add_scalar("Test/PSNR", psnr, epoch + 1)
        writer.add_scalar("Test/SSIM", ssim, epoch + 1)

        # ---- checkpoints (reference train.py:207-226)
        d_variables = jax.device_get(
            {"params": state.d_params, "batch_stats": state.d_stats}
        )
        save_variables_npz(os.path.join(results_dir, "g_last.npz"), g_variables)
        save_variables_npz(os.path.join(results_dir, "d_last.npz"), d_variables)
        is_best = policy.save_epoch(state, epoch, psnr, ssim)
        if is_best:
            save_variables_npz(os.path.join(results_dir, "g_best.npz"), g_variables)
            save_variables_npz(os.path.join(results_dir, "d_best.npz"), d_variables)
        if 0 < epoch and epoch % config.G_CHECKPOINT_INTERVAL == 0:
            save_variables_npz(os.path.join(results_dir, f"g_epoch{epoch}.npz"), g_variables)
        if 0 < epoch and epoch % config.D_CHECKPOINT_INTERVAL == 0:
            save_variables_npz(os.path.join(results_dir, f"d_epoch{epoch}.npz"), d_variables)

    writer.close()
    return state


if __name__ == "__main__":
    from srgan_st_tpu.core.config import Config

    train(Config())
