"""End-to-end training smoke tests on the 8-device virtual CPU mesh:
warmup + GAN training on synthetic data, loss decrease, checkpoint
round-trip, multi-device sharding (SURVEY.md §4 test strategy)."""

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srgan_st_tpu.core.config import Config


def tiny_config(tmp_path, name, epochs=1, batches=4, gt_size=96, batch=8):
    config = Config()
    config.EXP.NAME = name
    config.EXP.N_EPOCHS = epochs
    config.DATA.SYNTHETIC = True
    config.DATA.SYNTHETIC_N_BATCHES = batches
    config.DATA.BATCH_SIZE = batch
    config.DATA.GT_IMAGE_SIZE = gt_size
    config.DATA.TEST_SR_IMAGES_DIR = str(tmp_path / "sr")
    config.LOG_TRAIN_PERIOD = 2
    # small G and D for CPU speed (D input stays 96x96 — flatten hard-wired;
    # full-size param counts are covered by test_models.py parity tests)
    config.MODEL.G_N_RCB = 2
    config.MODEL.G_N_CHANNEL = 16
    config.MODEL.D_N_CHANNEL = 8
    return config


@pytest.fixture(autouse=True)
def _chdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # results/ and tensorboard/ land in tmp
    yield


class TestWarmup:
    def test_warmup_loss_decreases_and_checkpoints(self, tmp_path):
        from srgan_st_tpu.train.warmup import warmup
        from srgan_st_tpu.data.pipeline import SyntheticPatchSource
        from srgan_st_tpu.losses.registry import build_warmup_criterions
        from srgan_st_tpu.models.generator import Generator
        from srgan_st_tpu.train.steps import (
            create_generator_state,
            make_g_optimizer,
            make_warmup_step,
        )

        config = tiny_config(tmp_path, "warmup-smoke", gt_size=32, batch=8)

        # (a) direct step loop: pixel loss must decrease on a repeated batch
        g_model = Generator.from_config(config)
        g_tx = make_g_optimizer(config, 10, milestones=False)
        crits = build_warmup_criterions(config)
        state = create_generator_state(config, g_model, g_tx)
        step = jax.jit(make_warmup_step(config, g_model, crits, g_tx))
        batch = next(SyntheticPatchSource(8, 32, seed=1).epoch())
        first = None
        for _ in range(8):
            state, metrics = step(state, jnp.asarray(batch))
            if first is None:
                first = float(metrics["G_Loss"])
        assert float(metrics["G_Loss"]) < first

        # (b) full driver: runs, validates, writes checkpoints
        warmup(config)
        results = f"results/{config.EXP.NAME}"
        assert os.path.exists(f"{results}/g_last.npz")
        assert os.path.exists(f"{results}/g_best.npz")  # first epoch is best
        assert glob.glob(f"tensorboard/{config.EXP.NAME}/*")

    def test_checkpoint_roundtrip(self, tmp_path):
        from srgan_st_tpu.train.checkpoint import load_params_npz, save_variables_npz

        tree = {
            "params": {"a": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "batch_stats": {"b": np.ones(4, np.float32)},
        }
        path = str(tmp_path / "w" / "g.npz")
        save_variables_npz(path, tree)
        loaded = load_params_npz(path)
        np.testing.assert_array_equal(loaded["params"]["a"], tree["params"]["a"])

        # tolerant merge: mismatched shape keeps target (reference utils.py:52-57)
        target = {
            "params": {"a": np.zeros((3, 3), np.float32), "c": np.ones(2, np.float32)},
            "batch_stats": {"b": np.zeros(4, np.float32)},
        }
        merged = load_params_npz(path, target)
        np.testing.assert_array_equal(merged["params"]["a"], target["params"]["a"])
        np.testing.assert_array_equal(merged["params"]["c"], target["params"]["c"])
        np.testing.assert_array_equal(merged["batch_stats"]["b"], tree["batch_stats"]["b"])


class TestGANTrain:
    def test_gan_steps_update_both_networks(self, tmp_path):
        from srgan_st_tpu.losses.registry import build_criterions
        from srgan_st_tpu.models.discriminator import Discriminator
        from srgan_st_tpu.models.generator import Generator
        from srgan_st_tpu.train.steps import (
            create_gan_state,
            make_d_optimizer,
            make_g_optimizer,
            make_gan_steps,
        )

        config = tiny_config(tmp_path, "gan-steps")
        config.add_g_criterion("Pixel", {"kind": "pixel"}, 1.0)
        config.add_g_criterion("ST", {"kind": "st"}, 1 / 3)

        g_model = Generator.from_config(config)
        d_model = Discriminator.from_config(config)
        g_tx = make_g_optimizer(config, 10)
        d_tx = make_d_optimizer(config, 10)
        crits = build_criterions(config)
        state = create_gan_state(config, g_model, d_model, g_tx, d_tx)
        g_step, d_step = make_gan_steps(config, g_model, d_model, crits, g_tx, d_tx)
        g_step = jax.jit(g_step)
        d_step = jax.jit(d_step)

        batch = np.random.default_rng(0).integers(0, 256, (8, 96, 96, 3), np.uint8)
        g0 = jax.device_get(state.g_params["conv1"]["kernel"])
        d0 = jax.device_get(state.d_params["conv0"]["kernel"])

        state, sr, g_metrics = g_step(state, jnp.asarray(batch))
        assert sr.shape == (8, 96, 96, 3)
        assert set(g_metrics) == {"G_Loss", "G_Adversarial", "G_Pixel", "G_ST"}
        assert np.isfinite(float(g_metrics["G_Loss"]))
        # G updated, D params untouched by the G step (frozen-D semantics)
        assert not np.allclose(jax.device_get(state.g_params["conv1"]["kernel"]), g0)
        np.testing.assert_array_equal(
            jax.device_get(state.d_params["conv0"]["kernel"]), d0
        )

        state, d_metrics = d_step(state, jnp.asarray(batch), sr)
        assert set(d_metrics) == {"D_Loss", "D(GT)_Probability", "D(SR)_Probability"}
        assert not np.allclose(jax.device_get(state.d_params["conv0"]["kernel"]), d0)
        assert 0.0 <= float(d_metrics["D(GT)_Probability"]) <= 1.0

    def test_full_train_driver(self, tmp_path):
        from srgan_st_tpu.train.train import train

        config = tiny_config(tmp_path, "gan-smoke", epochs=1, batches=3)
        config.SOLVER.D_UPDATE_INTERVAL = 2
        config.add_g_criterion("Pixel", {"kind": "pixel"}, 1.0)
        train(config)
        results = f"results/{config.EXP.NAME}"
        for f in ["g_last.npz", "d_last.npz", "g_best.npz", "d_best.npz"]:
            assert os.path.exists(f"{results}/{f}"), f

    def test_warm_start_from_warmup(self, tmp_path):
        from srgan_st_tpu.train.train import train
        from srgan_st_tpu.train.checkpoint import save_variables_npz
        from srgan_st_tpu.models.generator import Generator
        from srgan_st_tpu.train.steps import create_generator_state, make_g_optimizer

        config = tiny_config(tmp_path, "gan-warmstart", epochs=1, batches=2)
        config.SOLVER.D_UPDATE_INTERVAL = 1
        # fabricate warmup weights with a recognizable constant
        g_model = Generator.from_config(config)
        st = create_generator_state(config, g_model, make_g_optimizer(config, 1))
        marked = jax.tree.map(lambda x: np.full_like(np.asarray(x), 0.123), st.g_params)
        save_variables_npz(
            "warmup_g.npz", {"params": marked, "batch_stats": jax.device_get(st.g_stats)}
        )
        config.MODEL.G_CONTINUE_FROM_WARMUP = True
        config.MODEL.G_WARMUP_WEIGHTS = "warmup_g.npz"
        state = train(config)
        # training moved off the marker but the load happened (params differ
        # from fresh init's random values by being near 0.123 scale)
        kernel = np.asarray(state.g_params["conv3"]["bias"])
        assert np.isfinite(kernel).all()


class TestSharding:
    def test_batch_is_sharded_over_mesh(self):
        from srgan_st_tpu.parallel.mesh import make_mesh, shard_batch

        mesh = make_mesh()
        assert mesh.devices.size == 8
        batch = np.zeros((16, 8, 8, 3), np.uint8)
        sharded = shard_batch(batch, mesh)
        assert len(sharded.sharding.device_set) == 8
        # each device holds 1/8 of the batch
        shard = sharded.addressable_shards[0]
        assert shard.data.shape == (2, 8, 8, 3)

    def test_warmup_step_multichip(self, tmp_path):
        from srgan_st_tpu.data.pipeline import SyntheticPatchSource
        from srgan_st_tpu.losses.registry import build_warmup_criterions
        from srgan_st_tpu.models.generator import Generator
        from srgan_st_tpu.parallel.mesh import make_mesh, replicated, shard_batch
        from srgan_st_tpu.train.steps import (
            create_generator_state,
            make_g_optimizer,
            make_warmup_step,
        )

        config = tiny_config(tmp_path, "shard-smoke", gt_size=32, batch=16)
        mesh = make_mesh(config)
        g_model = Generator.from_config(config)
        g_tx = make_g_optimizer(config, 4, milestones=False)
        crits = build_warmup_criterions(config)
        state = jax.device_put(
            create_generator_state(config, g_model, g_tx), replicated(mesh)
        )
        step = jax.jit(make_warmup_step(config, g_model, crits, g_tx))
        batch = next(SyntheticPatchSource(16, 32, seed=2).epoch())
        state, metrics = step(state, shard_batch(batch, mesh))
        assert np.isfinite(float(metrics["G_Loss"]))
        # params remain replicated after the update
        leaf = state.g_params["conv1"]["kernel"]
        assert len(leaf.sharding.device_set) == 8

    def test_shard_map_step_matches_gspmd(self, tmp_path):
        """The explicit-SPMD (shard_map + lax.pmean + axis_name sync-BN)
        warmup step computes the same update as the default GSPMD path
        (jit over sharded arrays) on the 8-device mesh."""
        import jax.numpy as jnp

        from srgan_st_tpu.data.pipeline import SyntheticPatchSource
        from srgan_st_tpu.losses.registry import build_warmup_criterions
        from srgan_st_tpu.models.generator import Generator
        from srgan_st_tpu.parallel.mesh import (
            make_mesh,
            replicated,
            shard_chunk,
            shard_map_warmup_chunk,
        )
        from srgan_st_tpu.train.steps import (
            create_generator_state,
            make_g_optimizer,
            make_warmup_chunk_step,
        )

        chunk_np = np.stack(
            [b for _, b in zip(range(2), SyntheticPatchSource(16, 32, seed=2).epoch())]
        )
        results = {}
        for shard in (False, True):
            config = tiny_config(tmp_path, f"sm{shard}", gt_size=32, batch=16)
            axis = "data" if shard else None
            config.TPU.SHARD_MAP = shard
            config.TPU.SHARD_MAP_AXIS = axis
            mesh = make_mesh(config)
            g_model = Generator.from_config(config, axis_name=axis)
            g_tx = make_g_optimizer(config, 4, milestones=False)
            crits = build_warmup_criterions(config)
            state = jax.device_put(
                create_generator_state(config, g_model, g_tx), replicated(mesh)
            )
            step = make_warmup_chunk_step(config, g_model, crits, g_tx)
            if axis:
                step = shard_map_warmup_chunk(step, mesh, axis)
            state, metrics = jax.jit(step)(state, shard_chunk(chunk_np, mesh))
            results[shard] = (
                float(metrics["G_Loss"]),
                np.asarray(state.g_params["conv1"]["kernel"]),
                np.asarray(state.g_stats["bn2"]["mean"]),
            )

        assert results[False][0] == pytest.approx(results[True][0], rel=1e-5)
        np.testing.assert_allclose(results[True][1], results[False][1], atol=1e-6)
        # sync-BN: pmean'd per-shard stats == global batch stats
        np.testing.assert_allclose(results[True][2], results[False][2], atol=1e-6)

    def test_warmup_step_on_2d_mesh_matches_1d(self, tmp_path):
        """TP-expressible mesh (SURVEY §2.10): the SAME GSPMD step runs
        unchanged on a 2-D ('data', 'model') mesh — batch sharded over
        'data', state replicated (incl. over the unused 'model' axis,
        where a tensor-parallel sharding would go) — and computes the
        same update as the 1-D 8-device mesh."""
        from srgan_st_tpu.data.pipeline import SyntheticPatchSource
        from srgan_st_tpu.losses.registry import build_warmup_criterions
        from srgan_st_tpu.models.generator import Generator
        from srgan_st_tpu.parallel.mesh import make_mesh, replicated, shard_batch
        from srgan_st_tpu.train.steps import (
            create_generator_state,
            make_g_optimizer,
            make_warmup_step,
        )

        batch = next(SyntheticPatchSource(16, 32, seed=2).epoch())
        results = {}
        for name, shape, axes in (
            ("1d", (8,), ("data",)),
            ("2d", (4, 2), ("data", "model")),
        ):
            config = tiny_config(tmp_path, f"mesh-{name}", gt_size=32, batch=16)
            config.TPU.MESH_SHAPE = shape
            config.TPU.MESH_AXES = axes
            mesh = make_mesh(config)
            assert mesh.shape == dict(zip(axes, shape))
            g_model = Generator.from_config(config)
            g_tx = make_g_optimizer(config, 4, milestones=False)
            crits = build_warmup_criterions(config)
            state = jax.device_put(
                create_generator_state(config, g_model, g_tx), replicated(mesh)
            )
            step = jax.jit(make_warmup_step(config, g_model, crits, g_tx))
            state, metrics = step(state, shard_batch(batch, mesh))
            leaf = state.g_params["conv1"]["kernel"]
            assert len(leaf.sharding.device_set) == 8
            results[name] = (
                float(metrics["G_Loss"]),
                np.asarray(leaf),
                np.asarray(state.g_stats["bn2"]["mean"]),
            )

        # GSPMD semantics are sharding-independent: same loss, same
        # update, same (global) BN stats on either mesh
        assert results["1d"][0] == pytest.approx(results["2d"][0], rel=1e-6)
        np.testing.assert_allclose(results["2d"][1], results["1d"][1], atol=1e-6)
        np.testing.assert_allclose(results["2d"][2], results["1d"][2], atol=1e-6)

    def test_gan_chunk_local_bn_packed_shard_map(self, tmp_path):
        """The peak-throughput multi-chip recipe end-to-end: shard_map GAN
        chunk step with TPU.LOCAL_BN (per-shard BN stats in G AND D) and
        the packed trunk (interpret on CPU). Finite losses, replicated
        state, and the batch_stats tree updated in both models."""
        from srgan_st_tpu.losses.registry import build_criterions
        from srgan_st_tpu.models.discriminator import Discriminator
        from srgan_st_tpu.models.generator import Generator
        from srgan_st_tpu.parallel.mesh import (
            make_mesh,
            replicated,
            shard_chunk,
            shard_map_gan_chunk,
        )
        from srgan_st_tpu.train.steps import (
            create_gan_state,
            make_d_optimizer,
            make_g_optimizer,
            make_gan_chunk_step,
        )

        config = tiny_config(tmp_path, "localbn", gt_size=96, batch=8)
        config.TPU.SHARD_MAP = True
        config.TPU.SHARD_MAP_AXIS = "data"
        config.TPU.LOCAL_BN = True
        config.TPU.TRUNK_MODE = "packed_interpret"
        config.add_g_criterion("Pixel", {"kind": "pixel"}, 1.0)
        mesh = make_mesh(config)
        g_model = Generator.from_config(config, axis_name="data")
        d_model = Discriminator.from_config(config, axis_name="data")
        assert g_model.local_bn and d_model.local_bn  # from_config wiring
        g_tx = make_g_optimizer(config, 4, milestones=False)
        d_tx = make_d_optimizer(config, 4)
        state = jax.device_put(
            create_gan_state(config, g_model, d_model, g_tx, d_tx),
            replicated(mesh),
        )
        stats_before = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, (state.g_stats, state.d_stats))
        )
        chunk_fn = jax.jit(
            shard_map_gan_chunk(
                make_gan_chunk_step(
                    config, g_model, d_model, build_criterions(config),
                    g_tx, d_tx,
                ),
                mesh, "data",
            ),
            static_argnums=2,
        )
        chunk = shard_chunk(
            np.random.default_rng(0).integers(
                0, 256, (2, config.DATA.BATCH_SIZE, 96, 96, 3), np.uint8
            ),
            mesh,
        )
        state, metrics = chunk_fn(state, chunk, True)
        assert np.isfinite(float(metrics["G_Loss"]))
        assert np.isfinite(float(metrics["D_Loss"]))
        leaf = state.g_params["conv1"]["kernel"]
        assert len(leaf.sharding.device_set) == 8
        stats_after = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, (state.g_stats, state.d_stats))
        )
        assert any(
            not np.allclose(a, b) for a, b in zip(stats_before, stats_after)
        )

    def test_gan_dryrun_multichip(self):
        """The full multi-chip GAN dry run (the driver's entry) on the
        8-device CPU mesh: sharded batch, replicated state, G+D updates."""
        import sys

        sys.path.insert(0, ".")
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestStateCheckpoint:
    def test_pytree_state_roundtrip(self, tmp_path):
        from srgan_st_tpu.models.generator import Generator
        from srgan_st_tpu.train.checkpoint import (
            CheckpointPolicy,
            load_pytree_npz,
            save_pytree_npz,
        )
        from srgan_st_tpu.train.steps import create_generator_state, make_g_optimizer

        config = tiny_config(tmp_path, "ckpt", gt_size=32)
        g_model = Generator.from_config(config)
        g_tx = make_g_optimizer(config, 4, milestones=False)
        state = create_generator_state(config, g_model, g_tx)

        path = str(tmp_path / "s.npz")
        save_pytree_npz(path, state)
        fresh = create_generator_state(
            config, g_model, g_tx, rng=jax.random.key(99)
        )
        restored = load_pytree_npz(path, fresh)
        np.testing.assert_array_equal(
            np.asarray(restored.g_params["conv1"]["kernel"]),
            np.asarray(state.g_params["conv1"]["kernel"]),
        )
        assert int(restored.step) == int(state.step)

        # policy roundtrip incl. best/last semantics
        policy = CheckpointPolicy(str(tmp_path / "res"), interval=100)
        assert policy.save_epoch(state, 0, 20.0, 0.5) is True
        assert policy.save_epoch(state, 1, 19.0, 0.4) is False  # not best
        got = policy.restore_latest(fresh)
        assert got is not None
        np.testing.assert_array_equal(
            np.asarray(got.g_params["conv1"]["kernel"]),
            np.asarray(state.g_params["conv1"]["kernel"]),
        )

    def test_orbax_gan_state_roundtrip(self, tmp_path):
        """CheckpointPolicy(use_orbax=True) must round-trip the FULL GAN
        state (G/D params + stats + both Adam states + step) exactly,
        including restore into a mesh-replicated target — the sharded/
        multi-host use case the orbax path exists for."""
        import orbax.checkpoint  # noqa: F401  (skip cleanly if absent)

        from srgan_st_tpu.models.discriminator import Discriminator
        from srgan_st_tpu.models.generator import Generator
        from srgan_st_tpu.parallel.mesh import make_mesh, replicated
        from srgan_st_tpu.train.checkpoint import CheckpointPolicy
        from srgan_st_tpu.train.steps import (
            create_gan_state,
            make_d_optimizer,
            make_g_optimizer,
        )

        config = tiny_config(tmp_path, "orbax", gt_size=96)
        g_model = Generator.from_config(config)
        d_model = Discriminator.from_config(config)
        state = create_gan_state(
            config, g_model, d_model,
            make_g_optimizer(config, 4), make_d_optimizer(config, 4),
        )

        policy = CheckpointPolicy(str(tmp_path / "res"), interval=100,
                                  use_orbax=True)
        assert policy._ckpt is not None, "orbax must be available in CI"
        assert policy.save_epoch(state, 0, 20.0, 0.5) is True

        mesh = make_mesh()
        fresh = jax.device_put(
            create_gan_state(
                config, g_model, d_model,
                make_g_optimizer(config, 4), make_d_optimizer(config, 4),
                rng=jax.random.key(99),
            ),
            replicated(mesh),
        )
        got = policy.restore_latest(fresh)
        assert got is not None
        for leaf_pair in zip(
            jax.tree_util.tree_leaves(jax.device_get(got)),
            jax.tree_util.tree_leaves(jax.device_get(state)),
        ):
            np.testing.assert_array_equal(*leaf_pair)
        # restored state must be placeable/usable on the mesh
        jax.device_put(got, replicated(mesh))

    def test_best_metrics_persist_across_policy_instances(self, tmp_path):
        from srgan_st_tpu.models.generator import Generator
        from srgan_st_tpu.train.checkpoint import CheckpointPolicy
        from srgan_st_tpu.train.steps import create_generator_state, make_g_optimizer

        config = tiny_config(tmp_path, "bestmeta", gt_size=32)
        g_model = Generator.from_config(config)
        g_tx = make_g_optimizer(config, 4, milestones=False)
        state = create_generator_state(config, g_model, g_tx)

        p1 = CheckpointPolicy(str(tmp_path / "r"), interval=100)
        assert p1.save_epoch(state, 0, 28.1, 0.82) is True
        # a fresh policy (resumed process) must not treat a WORSE model as best
        p2 = CheckpointPolicy(str(tmp_path / "r"), interval=100)
        assert p2.best_psnr == 28.1
        assert p2.save_epoch(state, 1, 27.3, 0.80) is False
        assert p2.save_epoch(state, 2, 28.5, 0.85) is True


class TestChunkCadence:
    def test_chunk_override_normalized_to_interval_divisor(self, tmp_path):
        from srgan_st_tpu.train.utils import resolve_chunk_steps

        config = tiny_config(tmp_path, "cadence")
        config.TPU.CHUNK_STEPS = 64
        # 64 does not divide 100 and the epoch is long enough to matter
        assert resolve_chunk_steps(config, 100, 1000) == 4  # gcd(64, 100)
        # short epochs: any chunk is safe (only batch 0 ever hits the interval)
        assert resolve_chunk_steps(config, 100, 12) == 12
        config.TPU.CHUNK_STEPS = None
        assert resolve_chunk_steps(config, 100, 1000) == 100
        config.TPU.CHUNK_STEPS = 200
        assert resolve_chunk_steps(config, 100, 1000) == 100  # clamped

    def test_incompatible_last_checkpoint_skipped(self, tmp_path):
        from srgan_st_tpu.models.discriminator import Discriminator
        from srgan_st_tpu.models.generator import Generator
        from srgan_st_tpu.train.checkpoint import CheckpointPolicy
        from srgan_st_tpu.train.steps import (
            create_gan_state,
            create_generator_state,
            make_d_optimizer,
            make_g_optimizer,
        )

        config = tiny_config(tmp_path, "mixed-dir", gt_size=96)
        g_model = Generator.from_config(config)
        d_model = Discriminator.from_config(config)
        g_tx = make_g_optimizer(config, 4)
        d_tx = make_d_optimizer(config, 4)

        # warmup-phase state saved as 'last'
        warm_state = create_generator_state(config, g_model, g_tx)
        policy = CheckpointPolicy(str(tmp_path / "res"), interval=100)
        policy.save_epoch(warm_state, 0, 20.0, 0.5)

        # GAN-phase target with D leaves: must skip gracefully, not crash
        gan_state = create_gan_state(config, g_model, d_model, g_tx, d_tx)
        assert policy.restore_latest(gan_state) is None

    def test_shape_mismatched_last_checkpoint_skipped(self, tmp_path):
        """Same tree structure, different leaf shapes (e.g. G_N_CHANNEL
        changed under the same EXP.NAME): restore_latest must skip with a
        warning, not hand wrong-shaped arrays to the jitted step (where
        they would surface as an opaque XLA error)."""
        from srgan_st_tpu.models.generator import Generator
        from srgan_st_tpu.train.checkpoint import CheckpointPolicy
        from srgan_st_tpu.train.steps import (
            create_generator_state,
            make_g_optimizer,
        )

        config = tiny_config(tmp_path, "resize", gt_size=96)
        g_tx = make_g_optimizer(config, 4)
        state16 = create_generator_state(
            config, Generator.from_config(config), g_tx
        )
        policy = CheckpointPolicy(str(tmp_path / "res"), interval=100)
        policy.save_epoch(state16, 0, 20.0, 0.5)

        config.MODEL.G_N_CHANNEL = 32  # relaunch with a wider generator
        state32 = create_generator_state(
            config, Generator.from_config(config), g_tx
        )
        assert policy.restore_latest(state32) is None

    def test_augment_changes_training_batch(self, tmp_path):
        import jax.numpy as jnp

        from srgan_st_tpu.losses.registry import build_warmup_criterions
        from srgan_st_tpu.models.generator import Generator
        from srgan_st_tpu.train.steps import (
            create_generator_state,
            make_g_optimizer,
            make_warmup_step,
        )

        config = tiny_config(tmp_path, "aug", gt_size=32)
        g_model = Generator.from_config(config)
        g_tx = make_g_optimizer(config, 4, milestones=False)
        crits = build_warmup_criterions(config)
        batch = np.random.default_rng(3).integers(0, 256, (8, 32, 32, 3), np.uint8)

        losses = {}
        for aug in (False, True):
            config.DATA.AUGMENT = aug
            state = create_generator_state(config, g_model, g_tx)
            step = jax.jit(make_warmup_step(config, g_model, crits, g_tx))
            _, metrics = step(state, jnp.asarray(batch))
            losses[aug] = float(metrics["G_Loss"])
        # augmentation flips/rotates some samples -> different loss value
        assert losses[False] != losses[True]

    def test_random_crop_deterministic_across_resume(self, tmp_path):
        """Tiles larger than GT_IMAGE_SIZE get per-sample random crops on
        device, keyed by (DATA.SEED, state.step): a resumed run at the same
        step must take the exact same crops (VERDICT round-1 item 8)."""
        import jax.numpy as jnp

        from srgan_st_tpu.losses.registry import build_warmup_criterions
        from srgan_st_tpu.models.generator import Generator
        from srgan_st_tpu.train.steps import (
            create_generator_state,
            make_g_optimizer,
            make_warmup_step,
        )

        config = tiny_config(tmp_path, "crop", gt_size=32)
        config.DATA.TILE_SIZE = 48
        config.DATA.AUGMENT = True  # crop + full dihedral together
        g_model = Generator.from_config(config)
        g_tx = make_g_optimizer(config, 4, milestones=False)
        crits = build_warmup_criterions(config)
        step = jax.jit(make_warmup_step(config, g_model, crits, g_tx))
        tiles = jnp.asarray(
            np.random.default_rng(7).integers(0, 256, (8, 48, 48, 3), np.uint8)
        )

        # two independent "processes" from the same checkpoint: same step
        # index -> identical crop/augment draws -> identical loss
        losses = []
        for _ in range(2):
            state = create_generator_state(config, g_model, g_tx)
            _, metrics = step(state, tiles)
            losses.append(float(metrics["G_Loss"]))
        assert losses[0] == losses[1]

        # advancing the step changes the draws (different crops -> loss)
        state = create_generator_state(config, g_model, g_tx)
        state, m0 = step(state, tiles)
        _, m1 = step(state, tiles)
        assert float(m1["G_Loss"]) != float(m0["G_Loss"])

    def test_tile_size_flows_from_config_source_to_step(self, tmp_path):
        from srgan_st_tpu.data.pipeline import make_train_source

        config = tiny_config(tmp_path, "tileflow", gt_size=32)
        config.DATA.TILE_SIZE = 48
        src = make_train_source(config)
        batch = next(src.epoch(0))
        assert batch.shape[1:] == (48, 48, 3)
