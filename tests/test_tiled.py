"""Tiled large-image inference must equal whole-image inference exactly."""

import numpy as np

import jax
import jax.numpy as jnp

from srgan_st_tpu.eval.tiled import TiledApplier, generator_halo
from srgan_st_tpu.models.generator import Generator


def test_tiled_equals_whole_image(rng):
    g = Generator(channels=8, num_rcb=2, upscale=4)
    variables = g.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)), train=False)

    def apply_fn(lr):
        return g.apply(variables, lr, train=False)

    halo = generator_halo(num_rcb=2, upscale=4)  # 4 + 4 + 1 + 2 + 1 = 12
    lr = rng.random((1, 70, 93, 3), dtype=np.float32)  # odd, non-multiple sizes

    whole = np.asarray(apply_fn(jnp.asarray(lr)))
    tiled = TiledApplier(apply_fn, upscale=4, tile=16, halo=halo, tile_batch=4)(lr)
    # fp reassociation across conv shapes: not bit-identical, but exact math
    np.testing.assert_allclose(tiled, whole, atol=1e-5)


def test_small_image_fallback(rng):
    g = Generator(channels=8, num_rcb=2, upscale=4)
    variables = g.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)), train=False)

    def apply_fn(lr):
        return g.apply(variables, lr, train=False)

    lr = rng.random((1, 10, 10, 3), dtype=np.float32)
    whole = np.asarray(apply_fn(jnp.asarray(lr)))
    tiled = TiledApplier(apply_fn, upscale=4, tile=16, halo=12)(lr)
    np.testing.assert_allclose(tiled, whole, atol=1e-5)  # jit vs eager fusion


def test_halo_formula():
    assert generator_halo(16, 4) == 40
    assert generator_halo(2, 4) == 12


def test_tiled_mesh_sharded_equals_whole_image(rng):
    """SURVEY §5 spatial-parallel row: tile batches sharded over the 8-device
    ('data',) mesh must reproduce whole-image inference exactly."""
    from srgan_st_tpu.parallel.mesh import make_mesh

    g = Generator(channels=8, num_rcb=2, upscale=4)
    variables = g.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)), train=False)

    def apply_fn(lr):
        return g.apply(variables, lr, train=False)

    lr = rng.random((1, 70, 93, 3), dtype=np.float32)
    whole = np.asarray(apply_fn(jnp.asarray(lr)))
    mesh = make_mesh()
    assert mesh.devices.size == 8
    tiled = TiledApplier(
        apply_fn, upscale=4, tile=16, halo=12, tile_batch=8, mesh=mesh
    )(lr)
    np.testing.assert_allclose(tiled, whole, atol=1e-5)


def test_tiled_batch_gt1(rng):
    """B>1 inputs are tiled per-image (previously lr[1:] was silently
    dropped), and equal the stacked per-image results."""
    g = Generator(channels=8, num_rcb=2, upscale=4)
    variables = g.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)), train=False)

    def apply_fn(lr):
        return g.apply(variables, lr, train=False)

    lr = rng.random((3, 44, 52, 3), dtype=np.float32)
    applier = TiledApplier(apply_fn, upscale=4, tile=16, halo=12, tile_batch=4)
    out = applier(lr)
    assert out.shape == (3, 44 * 4, 52 * 4, 3)
    whole = np.asarray(apply_fn(jnp.asarray(lr)))
    np.testing.assert_allclose(out, whole, atol=1e-5)
