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
from srgan_st_tpu.parallel.distributed import initialize_distributed, is_coordinator
from srgan_st_tpu.parallel.mesh import make_mesh, replicated
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
    make_gan_chunk_step,
)
from srgan_st_tpu.train.utils import iter_chunks, make_test_pairs, resolve_chunk_steps


def train(config):
    initialize_distributed()  # no-op single-process; see parallel/distributed.py
    coord = is_coordinator()
    rng = jax.random.key(config.DATA.SEED)

    mesh = make_mesh(config)
    source = make_train_source(config)
    steps_per_epoch = len(source)

    # explicit-SPMD option (see core/config.py TPU.SHARD_MAP): models get
    # the mesh axis for sync-BN; steps pmean grads/metrics over it
    axis = config.TPU.MESH_AXES[0] if config.TPU.get("SHARD_MAP") else None
    config.TPU.SHARD_MAP_AXIS = axis
    g_model = Generator.from_config(config, axis_name=axis)
    d_model = Discriminator.from_config(config, axis_name=axis)
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

    # Device-side scan over D_UPDATE_INTERVAL batches per dispatch: the D
    # update and the logged metrics land on the chunk's first batch, exactly
    # the reference's cadence (train.py:149,169 — both default to 100).
    chunk_size = resolve_chunk_steps(
        config, config.SOLVER.D_UPDATE_INTERVAL, steps_per_epoch
    )
    chunk_step = make_gan_chunk_step(config, g_model, d_model, criterions, g_tx, d_tx)
    if config.TPU.get("NAN_GUARD"):
        from srgan_st_tpu.utils.debugging import nan_guard

        chunk_step = nan_guard(chunk_step)
    if axis:
        from srgan_st_tpu.parallel.mesh import shard_map_gan_chunk

        chunk_step = shard_map_gan_chunk(chunk_step, mesh, axis)
    chunk_fn = jax.jit(chunk_step, donate_argnums=0, static_argnums=2)

    writer = ExperimentWriter(config)
    results_dir = f"results/{config.EXP.NAME}"
    policy = CheckpointPolicy(results_dir, config.G_CHECKPOINT_INTERVAL,
                              use_orbax=config.EXP.ORBAX_CHECKPOINTS)
    test_pairs = make_test_pairs(config)

    # Optional auto-resume (improvement over the reference, which restarts
    # the epoch counter but never reloads *_last; SURVEY.md §5). The true
    # epoch comes from the checkpoint's step counter, not START_EPOCH.
    start_epoch = config.EXP.START_EPOCH
    if start_epoch > 0 or config.EXP.AUTO_RESUME:
        restored = policy.restore_latest(state)
        if restored is not None:
            state = jax.device_put(restored, replicated(mesh))
            start_epoch = int(jax.device_get(state.step)) // steps_per_epoch
            if start_epoch != config.EXP.START_EPOCH:
                print(
                    f"resuming at epoch {start_epoch} (from checkpoint step), "
                    f"not START_EPOCH={config.EXP.START_EPOCH}"
                )

    for epoch in range(start_epoch, config.EXP.N_EPOCHS):
        print(f"Beginning train epoch: {epoch+1}")

        batch_num = 0
        d_vals = {}
        for chunk in iter_chunks(source, epoch, chunk_size, mesh=mesh):
            do_d = batch_num % config.SOLVER.D_UPDATE_INTERVAL == 0
            state, metrics = chunk_fn(state, chunk, do_d)

            if batch_num % config.LOG_TRAIN_PERIOD == 0:
                vals = jax.device_get(metrics)
                if "D_Loss" in vals:
                    d_vals = {k: vals[k] for k in
                              ("D_Loss", "D(GT)_Probability", "D(SR)_Probability")}
                batches_done = batch_num + epoch * steps_per_epoch
                for name, val in {**d_vals, **vals}.items():
                    writer.add_scalar(f"Train/{name}", val, batches_done)
                print(
                    f"[Epoch {epoch+1}/{config.EXP.N_EPOCHS}] "
                    f"[Batch {batch_num}/{steps_per_epoch}] "
                    f"[D loss: {float(d_vals.get('D_Loss', float('nan')))}] "
                    f"[G loss: {float(vals['G_Loss'])}]"
                )
            batch_num += len(chunk)

        # ---- validate (reference train.py:191-201); coordinator only —
        # non-coordinators would discard the result (pure local compute)
        g_variables = jax.device_get(
            {"params": state.g_params, "batch_stats": state.g_stats}
        )
        psnr = ssim = float("nan")
        if coord:
            psnr, ssim = validate(
                make_generator_apply(config, g_variables), test_pairs, config
            )
            if epoch % config.LOG_VALIDATION_PERIOD == 0:
                print(f"[Test: {epoch+1}/{config.EXP.N_EPOCHS}] [PSNR: {psnr}] [SSIM: {ssim}]")
            writer.add_scalar("Test/PSNR", psnr, epoch + 1)
            writer.add_scalar("Test/SSIM", ssim, epoch + 1)

        # ---- checkpoints (reference train.py:207-226); npz writes are
        # process-0-only, but orbax state saves are collective (all
        # processes must call save_epoch — policy.collective)
        if coord:
            d_variables = jax.device_get(
                {"params": state.d_params, "batch_stats": state.d_stats}
            )
            save_variables_npz(os.path.join(results_dir, "g_last.npz"), g_variables)
            save_variables_npz(os.path.join(results_dir, "d_last.npz"), d_variables)
        is_best = (
            policy.save_epoch(state, epoch, psnr, ssim)
            if (coord or policy.collective) else False
        )
        if coord:
            if is_best:
                save_variables_npz(os.path.join(results_dir, "g_best.npz"), g_variables)
                save_variables_npz(os.path.join(results_dir, "d_best.npz"), d_variables)
            if 0 < epoch and epoch % config.G_CHECKPOINT_INTERVAL == 0:
                save_variables_npz(os.path.join(results_dir, f"g_epoch{epoch}.npz"), g_variables)
            if 0 < epoch and epoch % config.D_CHECKPOINT_INTERVAL == 0:
                save_variables_npz(os.path.join(results_dir, f"d_epoch{epoch}.npz"), d_variables)

    writer.close()
    return state


def cli(argv=None) -> None:
    """Config-driven CLI for the GAN phase (``python -m srgan_st_tpu train``).

    The config is code-as-config (reference config.py); flags cover the
    common knobs and ``--set GROUP.FIELD=value`` reaches everything else.
    """
    from srgan_st_tpu.core.config import parse_driver_cli

    train(parse_driver_cli(
        argv,
        description="Adversarial (GAN) training phase. Starts from the "
        "warmup checkpoint configured in MODEL.G_WARMUP_WEIGHTS when present.",
        set_example="--set TPU.COMPUTE_DTYPE=bfloat16 --set EXP.N_EPOCHS=20",
    ))


if __name__ == "__main__":
    cli()
