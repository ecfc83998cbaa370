"""Pallas kernel parity tests (interpret mode on the CPU mesh)."""

import numpy as np
import pytest

import jax.numpy as jnp

from srgan_st_tpu.kernels.buddy_select import buddy_select
from srgan_st_tpu.losses.functions import _buddy_select


@pytest.mark.parametrize("dist_norm", ["l2", "l1"])
def test_buddy_select_matches_xla(rng, dist_norm):
    b, n, m, d = 2, 16, 24, 27
    p1 = jnp.asarray(rng.random((b, n, d), dtype=np.float32))
    p2 = jnp.asarray(rng.random((b, n, d), dtype=np.float32))
    bank = jnp.asarray(rng.random((b, m, d), dtype=np.float32))

    golden = _buddy_select(p1, p2, bank, 1.0, 1.0, dist_norm, pallas=False)
    got = buddy_select(p1, p2, bank, 1.0, 1.0, dist_norm, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(golden), atol=1e-6)


def test_buddy_select_alpha_beta(rng):
    b, n, m, d = 1, 8, 12, 9
    p1 = jnp.asarray(rng.random((b, n, d), dtype=np.float32))
    p2 = jnp.asarray(rng.random((b, n, d), dtype=np.float32))
    bank = jnp.asarray(rng.random((b, m, d), dtype=np.float32))
    golden = _buddy_select(p1, p2, bank, 0.3, 2.0, "l2", pallas=False)
    got = buddy_select(p1, p2, bank, 0.3, 2.0, "l2", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(golden), atol=1e-6)


class TestCoarseConv:
    @pytest.mark.parametrize("shape", [(2, 8, 8, 8, 4), (1, 12, 16, 16, 3)])
    def test_matches_xla_coarse_conv(self, rng, shape):
        """The lane-packed kernel == the plain coarse conv it factors
        (after undoing the inner s2d), in interpret mode on CPU."""
        from jax import lax

        from srgan_st_tpu.kernels.coarse_conv import coarse_conv_s2d
        from srgan_st_tpu.ops.subpixel_conv import depth_to_space

        b, h, w, c, n2 = shape
        y = jnp.asarray(rng.random((b, h, w, c), dtype=np.float32))
        w2 = jnp.asarray(rng.random((5, 5, c, n2), dtype=np.float32) - 0.5)
        golden = lax.conv_general_dilated(
            y, w2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        z = coarse_conv_s2d(y, w2, interpret=True)
        assert z.shape == (b, h // 2, w // 2, 4 * n2)
        got = depth_to_space(z, 2)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(golden), atol=1e-4
        )

    def test_full_pre_shuffled_pipeline(self, rng):
        """Kernel output run through both depth-to-space steps equals
        conv2d_subpixel_pre_shuffled (the production reference path)."""
        from srgan_st_tpu.kernels.coarse_conv import coarse_conv_s2d
        from srgan_st_tpu.ops.subpixel_conv import (
            _coarse_kernel,
            conv2d_subpixel_pre_shuffled,
            depth_to_space,
        )

        b, hc, wc, c, n = 2, 12, 12, 16, 3
        y = jnp.asarray(rng.random((b, hc, wc, c * 4), dtype=np.float32))
        w = jnp.asarray(rng.random((9, 9, c, n), dtype=np.float32) - 0.5)
        bias = jnp.asarray(rng.random((n,), dtype=np.float32))
        golden = conv2d_subpixel_pre_shuffled(y, w, bias, factor=2)
        w2 = _coarse_kernel(w, 2)
        z = coarse_conv_s2d(y, w2, interpret=True)
        got = depth_to_space(depth_to_space(z, 2), 2) + bias
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(golden), atol=1e-4
        )
