"""Model architecture tests: parameter-count parity with the reference
(model.py:193-194) and shape/semantics checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srgan_st_tpu.core.config import Config
from srgan_st_tpu.models import Discriminator, Generator
from srgan_st_tpu.models.common import pixel_shuffle


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


@pytest.fixture(scope="module")
def config():
    return Config()


class TestGenerator:
    def test_param_count_parity(self, config):
        g = Generator.from_config(config)
        variables = g.init(jax.random.key(0), jnp.zeros((1, 24, 24, 3)), train=False)
        # reference model.py:193: 1,547,350 parameters
        assert n_params(variables["params"]) == 1_547_350

    def test_forward_shape_and_range(self, config):
        g = Generator.from_config(config)
        variables = g.init(jax.random.key(0), jnp.zeros((1, 24, 24, 3)), train=False)
        x = jax.random.uniform(jax.random.key(1), (2, 24, 24, 3))
        out = g.apply(variables, x, train=False)
        assert out.shape == (2, 96, 96, 3)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    @pytest.mark.parametrize("upscale", [2, 3, 8])
    def test_other_upscales(self, config, upscale):
        g = Generator(upscale=upscale)
        variables = g.init(jax.random.key(0), jnp.zeros((1, 12, 12, 3)), train=False)
        out = g.apply(variables, jnp.zeros((1, 12, 12, 3)), train=False)
        assert out.shape == (1, 12 * upscale, 12 * upscale, 3)

    @pytest.mark.parametrize("upscale", [4, 3])
    def test_conv3_modes_agree(self, upscale):
        """The fused last-shuffle+reconstruction path (conv3_mode=None),
        the standalone s2d-factored conv ("s2d") and the direct conv
        ("xla") share one param tree and compute the same function (the
        factorings reassociate the same dot products)."""
        kwargs = dict(channels=16, num_rcb=2, upscale=upscale)
        x = jax.random.uniform(jax.random.key(1), (2, 12, 12, 3))
        g_fused = Generator(**kwargs)  # default: fused
        variables = g_fused.init(jax.random.key(0), x, train=False)
        out_fused = g_fused.apply(variables, x, train=False)
        for mode in ("s2d", "xla"):
            out = Generator(**kwargs, conv3_mode=mode).apply(
                variables, x, train=False
            )
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(out_fused), atol=1e-5,
                err_msg=f"conv3_mode={mode} upscale={upscale}",
            )
        # recursive inner factoring of the fused coarse conv is exact too
        out = Generator(**kwargs, conv3_inner=2).apply(variables, x, train=False)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(out_fused), atol=1e-5,
            err_msg=f"conv3_inner=2 upscale={upscale}",
        )

    def test_stem_s2d_agrees(self):
        """stem_mode="s2d" (the serving stem factoring, config
        TPU.STEM_MODE) is the same dot products reassociated — exact vs
        the direct conv1 on the shared param tree."""
        kwargs = dict(channels=16, num_rcb=2, upscale=4)
        x = jax.random.uniform(jax.random.key(1), (2, 12, 12, 3))
        g_base = Generator(**kwargs)
        variables = g_base.init(jax.random.key(0), x, train=False)
        out_base = g_base.apply(variables, x, train=False)
        out_s2d = Generator(**kwargs, stem_mode="s2d").apply(
            variables, x, train=False
        )
        np.testing.assert_allclose(
            np.asarray(out_s2d), np.asarray(out_base), atol=1e-5
        )

    def test_serving_fields_reach_from_config(self, config):
        """TPU.STEM_MODE / TPU.CONV3_INNER / TPU.TRUNK_MODE are the user
        surface for the serving variants (tools/bench_serving.py); they
        must reach the Generator through from_config."""
        c = Config()
        c.TPU.STEM_MODE = "s2d"
        c.TPU.CONV3_INNER = 2
        c.TPU.TRUNK_MODE = "unfused"
        g = Generator.from_config(c)
        assert g.stem_mode == "s2d"
        assert g.conv3_inner == 2
        assert g.trunk_mode == "unfused"

    def test_batch_stats_update(self, config):
        g = Generator.from_config(config)
        variables = g.init(jax.random.key(0), jnp.zeros((1, 24, 24, 3)), train=False)
        x = jax.random.uniform(jax.random.key(1), (2, 24, 24, 3))
        _, mutated = g.apply(variables, x, train=True, mutable=["batch_stats"])
        before = jax.tree.leaves(variables["batch_stats"])
        after = jax.tree.leaves(mutated["batch_stats"])
        assert any(not np.allclose(b, a) for b, a in zip(before, after))


class TestDiscriminator:
    def test_param_count_parity(self, config):
        d = Discriminator.from_config(config)
        variables = d.init(jax.random.key(0), jnp.zeros((1, 96, 96, 3)), train=False)
        # reference model.py:194: 23,563,649 parameters
        assert n_params(variables["params"]) == 23_563_649

    def test_logits_out(self, config):
        d = Discriminator.from_config(config)
        variables = d.init(jax.random.key(0), jnp.zeros((1, 96, 96, 3)), train=False)
        x = jax.random.uniform(jax.random.key(1), (4, 96, 96, 3))
        out = d.apply(variables, x, train=False)
        assert out.shape == (4, 1)
        # logits, not probabilities: unbounded sign
        assert out.dtype == jnp.float32


class TestPixelShuffle:
    def test_matches_torch(self, rng):
        import torch

        x = rng.random((2, 8, 5, 6), dtype=np.float32)  # NCHW, C=8, r=2
        golden = torch.nn.functional.pixel_shuffle(torch.from_numpy(x), 2).numpy()
        got = np.asarray(pixel_shuffle(jnp.asarray(x.transpose(0, 2, 3, 1)), 2))
        np.testing.assert_array_equal(got.transpose(0, 3, 1, 2), golden)


class TestLocalBN:
    """common.BatchNorm stats_sync="ema" (config.TPU.LOCAL_BN): per-shard
    normalization statistics (torch DistributedDataParallel's default BN
    behaviour), while the running-stat EMA accumulates the cross-shard
    GLOBAL moments — so replicated batch_stats stay identical across
    shards and identical to what sync-BN would have stored."""

    def test_per_shard_normalize_global_ema(self, rng):
        from jax.sharding import PartitionSpec as P

        from srgan_st_tpu.models.common import BatchNorm
        from srgan_st_tpu.parallel.mesh import make_mesh, shard_map_step

        mesh = make_mesh()
        x = jnp.asarray(rng.standard_normal((16, 4, 4, 5)), jnp.float32)

        plain = BatchNorm()  # no axis: the purely local reference
        v = plain.init(jax.random.key(0), x[:2])

        def run(stats_sync):
            mod = BatchNorm(axis_name="data", stats_sync=stats_sync)

            def f(xs):
                return mod.apply(v, xs, mutable=["batch_stats"])

            return jax.jit(
                shard_map_step(f, mesh, in_specs=P("data"),
                               out_specs=(P("data"), P()))
            )(x)

        y_local, mut_local = run("ema")
        y_sync, mut_sync = run("full")

        # both modes accumulate the same GLOBAL moments into the EMA
        for a, b in zip(jax.tree.leaves(mut_local), jax.tree.leaves(mut_sync)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

        # normalization is per-shard: every shard equals the no-axis
        # BatchNorm applied to that shard's slice alone
        y_local = np.asarray(y_local)
        for i in range(8):
            sl = x[2 * i:2 * i + 2]
            y_ref, _ = plain.apply(v, sl, mutable=["batch_stats"])
            np.testing.assert_allclose(
                y_local[2 * i:2 * i + 2], np.asarray(y_ref), atol=1e-6
            )
        # and it genuinely differs from the sync-BN normalization
        assert float(np.abs(y_local - np.asarray(y_sync)).max()) > 1e-4
