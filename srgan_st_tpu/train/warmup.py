"""Generator pretraining ("SRResNet" warmup) driver.

Mirrors reference warmup.py:14-148: Adam on G only (no LR scheduler), the
WARMUP_CRITERIONS set (default pixel MSE), per-epoch validation, TensorBoard
scalars, and the g_last / g_best / g_epoch{N} checkpoint policy. TPU-native:
jitted donated step, data-parallel batch sharding over the ('data',) mesh.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from srgan_st_tpu.data.pipeline import make_train_source
from srgan_st_tpu.eval.validate import make_generator_apply, validate
from srgan_st_tpu.losses.registry import build_warmup_criterions
from srgan_st_tpu.models.generator import Generator
from srgan_st_tpu.parallel.distributed import initialize_distributed, is_coordinator
from srgan_st_tpu.parallel.mesh import make_mesh, replicated
from srgan_st_tpu.train.checkpoint import CheckpointPolicy, save_variables_npz
from srgan_st_tpu.train.logging import ExperimentWriter
from srgan_st_tpu.train.steps import (
    create_generator_state,
    make_g_optimizer,
    make_warmup_chunk_step,
)
from srgan_st_tpu.train.utils import iter_chunks, make_test_pairs, resolve_chunk_steps


def warmup(config):
    initialize_distributed()  # no-op single-process; see parallel/distributed.py
    coord = is_coordinator()
    # Seeding is explicit PRNG-key threading (replaces the reference's
    # global init_random_seed, warmup.py:17).
    rng = jax.random.key(config.DATA.SEED)

    mesh = make_mesh(config)
    source = make_train_source(config)
    steps_per_epoch = len(source)

    # explicit-SPMD option (see core/config.py TPU.SHARD_MAP)
    axis = config.TPU.MESH_AXES[0] if config.TPU.get("SHARD_MAP") else None
    config.TPU.SHARD_MAP_AXIS = axis
    g_model = Generator.from_config(config, axis_name=axis)
    g_tx = make_g_optimizer(config, steps_per_epoch, milestones=False)
    criterions = build_warmup_criterions(config)

    state = create_generator_state(config, g_model, g_tx, rng)
    state = jax.device_put(state, replicated(mesh))

    # Device-side scan over LOG_TRAIN_PERIOD batches per dispatch; metrics
    # come back for the chunk's first batch — the one the reference logs
    # (warmup.py:101-110).
    chunk_size = resolve_chunk_steps(config, config.LOG_TRAIN_PERIOD, steps_per_epoch)
    chunk_step = make_warmup_chunk_step(config, g_model, criterions, g_tx)
    if config.TPU.get("NAN_GUARD"):
        from srgan_st_tpu.utils.debugging import nan_guard

        chunk_step = nan_guard(chunk_step)
    if axis:
        from srgan_st_tpu.parallel.mesh import shard_map_warmup_chunk

        chunk_step = shard_map_warmup_chunk(chunk_step, mesh, axis)
    chunk_fn = jax.jit(chunk_step, donate_argnums=0)

    writer = ExperimentWriter(config)
    results_dir = f"results/{config.EXP.NAME}"
    policy = CheckpointPolicy(results_dir, config.G_CHECKPOINT_INTERVAL,
                              use_orbax=config.EXP.ORBAX_CHECKPOINTS)
    test_pairs = make_test_pairs(config)

    # Auto-resume from the last full state when restarting mid-run
    # (improvement over the reference, which restarts the epoch counter but
    # never reloads *_last; SURVEY.md §5). The true epoch comes from the
    # checkpoint's own step counter, not the user-supplied START_EPOCH.
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

    batches_done = start_epoch * steps_per_epoch
    for epoch in range(start_epoch, config.EXP.N_EPOCHS):
        print(f"Beginning train epoch: {epoch+1}")

        for chunk in iter_chunks(source, epoch, chunk_size, mesh=mesh):
            batch_num = batches_done % steps_per_epoch
            # the logged metrics belong to the chunk's FIRST batch; the
            # reference logs it at batches_done after that batch's
            # increment (warmup.py:75,105)
            log_step = batches_done + 1
            batches_done += len(chunk)
            state, metrics = chunk_fn(state, chunk)

            if batch_num % config.LOG_TRAIN_PERIOD != 0:
                continue
            metrics = jax.device_get(metrics)
            for name, val in metrics.items():
                writer.add_scalar(f"Train/{name}", val, log_step)
            print(
                f"[Epoch {epoch+1}/{config.EXP.N_EPOCHS}] "
                f"[Batch {batch_num}/{steps_per_epoch}] "
                f"[G loss: {float(metrics['G_Loss'])}]"
            )

        # ---- validate (reference warmup.py:115-125); coordinator only
        g_variables = {"params": state.g_params, "batch_stats": state.g_stats}
        psnr = ssim = float("nan")
        if coord:
            psnr, ssim = validate(
                make_generator_apply(config, jax.device_get(g_variables)),
                test_pairs, config,
            )
            print(f"[Test: {epoch+1}/{config.EXP.N_EPOCHS}] [PSNR: {psnr}] [SSIM: {ssim}]")
            writer.add_scalar("Test/PSNR", psnr, epoch + 1)
            writer.add_scalar("Test/SSIM", ssim, epoch + 1)

        # ---- checkpoints (reference warmup.py:128-147); npz writes are
        # process-0-only, but orbax state saves are collective (all
        # processes must call save_epoch — policy.collective)
        if coord:
            save_variables_npz(os.path.join(results_dir, "g_last.npz"), g_variables)
        is_best = (
            policy.save_epoch(state, epoch, psnr, ssim)
            if (coord or policy.collective) else False
        )
        if coord:
            if is_best:
                save_variables_npz(os.path.join(results_dir, "g_best.npz"), g_variables)
            if 0 < epoch and epoch % config.G_CHECKPOINT_INTERVAL == 0:
                save_variables_npz(
                    os.path.join(results_dir, f"g_epoch{epoch}.npz"), g_variables
                )

    writer.close()
    return state


def cli(argv=None) -> None:
    """Config-driven CLI for the warmup phase (``python -m srgan_st_tpu
    warmup``); same flag surface as train.cli."""
    from srgan_st_tpu.core.config import parse_driver_cli

    warmup(parse_driver_cli(
        argv,
        description="PSNR-oriented SRResNet warmup phase (pixel loss only); "
        "produces the generator checkpoint the GAN phase starts from.",
        set_example="--set TPU.COMPUTE_DTYPE=bfloat16 --set DATA.AUGMENT=true",
    ))


if __name__ == "__main__":
    cli()
