"""Multi-host (multi-process) readiness tests.

The reference has no distributed support at all (SURVEY.md §2.10); these
cover the TPU-native replacement: the jax.distributed entry hook, the
per-process data sharding of the input sources, and a REAL 2-process
integration run on virtual CPU devices (2 processes x 2 devices = one
4-device global mesh) executing a data-parallel warmup step.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from srgan_st_tpu.parallel.distributed import process_slice


class TestProcessSlice:
    def test_slices_partition_the_batch(self):
        got = np.zeros(12, bool)
        for p in range(3):
            s = process_slice(12, p, 3)
            assert not got[s].any()  # disjoint
            got[s] = True
        assert got.all()  # exhaustive

    def test_contiguous_blocks(self):
        assert process_slice(8, 0, 2) == slice(0, 4)
        assert process_slice(8, 1, 2) == slice(4, 8)

    def test_indivisible_batch_rejected(self):
        with pytest.raises(ValueError):
            process_slice(10, 0, 3)

    def test_single_process_is_identity(self):
        assert process_slice(16, 0, 1) == slice(0, 16)


class TestSourceSharding:
    def test_synthetic_slices_concatenate_to_global_batch(self):
        from srgan_st_tpu.data.pipeline import SyntheticPatchSource

        whole = next(SyntheticPatchSource(8, 16, seed=5).epoch(0))
        parts = [
            next(
                SyntheticPatchSource(
                    8, 16, seed=5, process_index=p, process_count=2
                ).epoch(0)
            )
            for p in range(2)
        ]
        assert parts[0].shape[0] == 4
        np.testing.assert_array_equal(np.concatenate(parts), whole)

    def test_packed_slices_concatenate_to_global_batch(self, tmp_path):
        from srgan_st_tpu.data.pipeline import PackedPatchSource

        pack = tmp_path / "patches.pack.npy"
        np.save(pack, np.random.default_rng(0).integers(
            0, 256, (32, 8, 8, 3), dtype=np.uint8))
        whole = next(PackedPatchSource(str(pack), 8, seed=1).epoch(0))
        parts = [
            next(PackedPatchSource(
                str(pack), 8, seed=1, process_index=p, process_count=2
            ).epoch(0))
            for p in range(2)
        ]
        np.testing.assert_array_equal(np.concatenate(parts), whole)

    def test_train_source_slices_files(self, tmp_path):
        from PIL import Image

        from srgan_st_tpu.data.pipeline import TrainPatchSource

        for i in range(8):
            Image.fromarray(
                np.full((8, 8, 3), i * 31, np.uint8)
            ).save(tmp_path / f"p{i}.png")
        whole = next(TrainPatchSource(
            str(tmp_path), 8, 8, seed=2, num_workers=1).epoch(0))
        parts = [
            next(TrainPatchSource(
                str(tmp_path), 8, 8, seed=2, num_workers=1,
                process_index=p, process_count=2,
            ).epoch(0))
            for p in range(2)
        ]
        np.testing.assert_array_equal(np.concatenate(parts), whole)


_CHILD = textwrap.dedent(
    """
    import jax
    jax.config.update("jax_platforms", "cpu")
    from srgan_st_tpu.parallel.distributed import initialize_distributed, is_coordinator
    assert initialize_distributed(), "env vars must trigger initialization"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    import numpy as np
    from srgan_st_tpu.core.config import Config
    from srgan_st_tpu.data.pipeline import make_train_source
    from srgan_st_tpu.losses.registry import build_warmup_criterions
    from srgan_st_tpu.models.generator import Generator
    from srgan_st_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    from srgan_st_tpu.train.steps import (
        create_generator_state, make_g_optimizer, make_warmup_step,
    )

    config = Config()
    config.DATA.SYNTHETIC = True
    config.DATA.BATCH_SIZE = 8     # global; 4 per process, 2 per device
    config.DATA.GT_IMAGE_SIZE = 32
    config.MODEL.G_N_RCB = 1
    config.MODEL.G_N_CHANNEL = 8

    mesh = make_mesh(config)       # 4 global devices
    source = make_train_source(config)
    local = next(source.epoch(0))
    assert local.shape[0] == 4, local.shape

    g_model = Generator.from_config(config)
    g_tx = make_g_optimizer(config, 4, milestones=False)
    crits = build_warmup_criterions(config)
    state = jax.device_put(
        create_generator_state(config, g_model, g_tx), replicated(mesh)
    )
    step = jax.jit(make_warmup_step(config, g_model, crits, g_tx))
    batch = shard_batch(local, mesh)
    assert batch.shape[0] == 8, batch.shape  # global array assembled
    state, metrics = step(state, batch)
    loss = float(metrics["G_Loss"])
    assert np.isfinite(loss)

    # explicit-SPMD path over the MULTI-HOST mesh: shard_map + pmean +
    # axis_name sync-BN (the path that keeps Pallas kernels per-shard)
    from srgan_st_tpu.parallel.mesh import shard_map_step
    from jax.sharding import PartitionSpec as Pspec

    config.TPU.SHARD_MAP = True
    config.TPU.SHARD_MAP_AXIS = "data"
    g_sm = Generator.from_config(config, axis_name="data")
    sm_state = jax.device_put(
        create_generator_state(config, g_sm, g_tx),
        jax.NamedSharding(mesh, Pspec()),
    )
    sm_step = jax.jit(shard_map_step(
        make_warmup_step(config, g_sm, crits, g_tx),
        mesh, in_specs=(Pspec(), Pspec("data")), out_specs=(Pspec(), Pspec()),
    ))
    sm_state, sm_metrics = sm_step(sm_state, batch)
    sm_loss = float(sm_metrics["G_Loss"])
    assert np.isfinite(sm_loss)

    # orbax checkpoint under multi-process: orbax saves are COLLECTIVE, so
    # every process calls save_epoch (policy.collective); eval metrics are
    # coordinator-only (NaN elsewhere) and get broadcast inside save_epoch
    # so all processes take the same is-best branch. Restore: every process
    # reads the shared-filesystem checkpoint.
    import os
    from srgan_st_tpu.train.checkpoint import CheckpointPolicy

    ckpt_dir = os.environ["SRGAN_ST_TEST_CKPT_DIR"]
    policy = CheckpointPolicy(ckpt_dir, interval=100, use_orbax=True)
    assert policy._ckpt is not None and policy.collective
    psnr, ssim = (20.0, 0.5) if is_coordinator() else (float("nan"),) * 2
    is_best = policy.save_epoch(state, 0, psnr, ssim)
    assert is_best, "broadcast metrics must make every process see is_best"
    fresh = jax.device_put(
        create_generator_state(config, g_model, g_tx, rng=jax.random.key(3)),
        replicated(mesh),
    )
    got = policy.restore_latest(fresh)
    assert got is not None
    np.testing.assert_array_equal(  # restored == the state that was saved
        np.asarray(got.g_params["conv1"]["kernel"]),
        np.asarray(state.g_params["conv1"]["kernel"]),
    )
    ck = float(np.asarray(got.g_params["conv1"]["kernel"]).ravel()[0])

    # HBM-resident packed source over the multi-host mesh: the pack is
    # replicated via make_array_from_process_local_data; each device
    # gathers its own batch shard on device. Local shards must equal the
    # host-path gather for this process's contiguous share.
    from srgan_st_tpu.data.pipeline import PackedPatchSource

    pack_path = os.environ["SRGAN_ST_TEST_PACK"]
    dev_src = PackedPatchSource(pack_path, 8, seed=3, device_cache=True)
    dev_chunk = next(dev_src.epoch_chunks_device(0, 2, mesh))
    assert dev_chunk.shape == (2, 8, 8, 8, 3), dev_chunk.shape
    host_src = PackedPatchSource(pack_path, 8, seed=3, device_cache=False)
    host_chunk = next(host_src.epoch_chunks(0, 2))
    local = np.concatenate(
        [np.asarray(s.data) for s in sorted(
            dev_chunk.addressable_shards, key=lambda s: s.index[1].start)],
        axis=1,
    )
    np.testing.assert_array_equal(local, host_chunk)

    print(f"COORD={int(is_coordinator())} LOSS={loss:.9e} SMLOSS={sm_loss:.9e}"
          f" CKPT={ck:.9e}",
          flush=True)
    """
)


@pytest.mark.slow
def test_two_process_cpu_mesh_warmup_step(tmp_path):
    """Launch TWO real processes with jax.distributed over localhost, each
    owning 2 virtual CPU devices, and run one data-parallel warmup step on
    the 4-device global mesh (global batch assembled from per-process
    slices). Both processes must agree on the (psum-reduced) loss."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    pack_path = tmp_path / "patches.pack.npy"
    np.save(pack_path, np.random.default_rng(9).integers(
        0, 256, (40, 8, 8, 3), np.uint8))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["SRGAN_ST_COORDINATOR"] = f"127.0.0.1:{port}"
        env["SRGAN_ST_TEST_CKPT_DIR"] = str(tmp_path / "ckpt")
        env["SRGAN_ST_TEST_PACK"] = str(pack_path)
        env["SRGAN_ST_NUM_PROCESSES"] = "2"
        env["SRGAN_ST_PROCESS_ID"] = str(pid)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["PYTHONPATH"] = os.pathsep.join(
            p for p in [repo, env.get("PYTHONPATH", "")] if p
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"rc={p.returncode}\n{out}\n{err}"
        outs.append(out)

    losses, sm_losses, ckpt_leaves = {}, set(), set()
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("COORD=")][-1]
        coord, loss, sm, ck = line.split()
        losses[coord] = loss.split("=")[1]
        sm_losses.add(sm.split("=")[1])
        ckpt_leaves.add(ck.split("=")[1])
    assert set(losses) == {"COORD=0", "COORD=1"}  # exactly one coordinator
    assert len(set(losses.values())) == 1, losses  # identical reduced loss
    assert len(sm_losses) == 1, sm_losses  # shard_map path agrees across hosts
    assert len(ckpt_leaves) == 1, ckpt_leaves  # both restored the same orbax ckpt
