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


class TestTapConvKernel:
    def test_fwd_matches_direct_conv(self, rng):
        import jax
        from jax import lax

        from srgan_st_tpu.kernels.tap_conv import tap_conv

        x = jnp.asarray(rng.random((2, 12, 14, 16), dtype=np.float32))
        w = jnp.asarray(rng.random((9, 9, 16, 3), dtype=np.float32) - 0.5)
        b = jnp.asarray(rng.random((3,), dtype=np.float32))
        golden = lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b
        got = tap_conv(x, w, b, "interpret")
        # kernel computes in bf16 passes (XLA's own default for fp32 convs
        # is also bf16 passes, but accumulation grouping differs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(golden),
                                   rtol=2e-2, atol=2e-2)

    def test_grads_match_direct_conv(self, rng):
        import jax
        from jax import lax

        from srgan_st_tpu.kernels.tap_conv import tap_conv

        x = jnp.asarray(rng.random((2, 10, 10, 8), dtype=np.float32))
        w = jnp.asarray(rng.random((9, 9, 8, 3), dtype=np.float32) - 0.5)
        b = jnp.zeros((3,), jnp.float32)

        def loss_tap(x, w, b):
            return (tap_conv(x, w, b, "interpret") ** 2).sum()

        def loss_direct(x, w, b):
            out = lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            ) + b
            return (out ** 2).sum()

        gt_grads = jax.grad(loss_direct, argnums=(0, 1, 2))(x, w, b)
        got_grads = jax.grad(loss_tap, argnums=(0, 1, 2))(x, w, b)
        for got, gt, name in zip(got_grads, gt_grads, "xwb"):
            got, gt = np.asarray(got), np.asarray(gt)
            # the kernel's bf16 passes shift the loss surface slightly vs the
            # all-fp32 golden; compare at bf16-appropriate relative scale
            scale = np.abs(gt).max()
            np.testing.assert_allclose(
                got, gt, atol=2e-2 * scale, err_msg=f"d{name}",
            )

    def test_xla_fallback_exact(self, rng):
        from jax import lax

        from srgan_st_tpu.kernels.tap_conv import tap_conv

        x = jnp.asarray(rng.random((1, 8, 8, 4), dtype=np.float32))
        w = jnp.asarray(rng.random((9, 9, 4, 3), dtype=np.float32) - 0.5)
        b = jnp.zeros((3,), jnp.float32)
        golden = lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        got = tap_conv(x, w, b, "xla")
        np.testing.assert_allclose(np.asarray(got), np.asarray(golden), atol=1e-6)
