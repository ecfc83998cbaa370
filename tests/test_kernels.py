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
