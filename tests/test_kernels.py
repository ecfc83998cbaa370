"""Pallas kernel parity tests (interpret mode on the CPU mesh)."""

import os

import numpy as np
import pytest

import jax
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


@pytest.mark.parametrize("dist_norm", ["l2", "l1"])
@pytest.mark.parametrize(
    "n,m,n_tile,m_tile",
    [
        (16, 24, 8, 8),    # even tile grid, multiple merges
        (17, 23, 8, 8),    # padded final N and M tiles
        (16, 24, 16, 7),   # M padding only, uneven tile
        (5, 3, 8, 8),      # single tile larger than the problem
    ],
)
def test_buddy_select_tiled_matches_xla(rng, dist_norm, n, m, n_tile, m_tile):
    """The tiled running-argmin path == the XLA gather at every tiling,
    including padded edge tiles (padding must never be selected)."""
    b, d = 2, 27
    p1 = jnp.asarray(rng.random((b, n, d), dtype=np.float32))
    p2 = jnp.asarray(rng.random((b, n, d), dtype=np.float32))
    bank = jnp.asarray(rng.random((b, m, d), dtype=np.float32))

    golden = _buddy_select(p1, p2, bank, 1.0, 1.0, dist_norm, pallas=False)
    got = buddy_select(p1, p2, bank, 1.0, 1.0, dist_norm, interpret=True,
                       n_tile=n_tile, m_tile=m_tile)
    np.testing.assert_allclose(np.asarray(got), np.asarray(golden), atol=1e-6)


def test_buddy_select_tiled_tie_break(rng):
    """Duplicate bank rows straddling tile boundaries: the tiled merge must
    keep global first-occurrence argmin semantics (strict < across tiles)."""
    b, n, d = 1, 4, 9
    p1 = jnp.asarray(rng.random((b, n, d), dtype=np.float32))
    p2 = jnp.asarray(rng.random((b, n, d), dtype=np.float32))
    # bank = the same 3 rows repeated 4x -> every argmin is a cross-tile tie
    base = rng.random((b, 3, d), dtype=np.float32)
    bank = jnp.asarray(np.tile(base, (1, 4, 1)))
    golden = _buddy_select(p1, p2, bank, 1.0, 1.0, "l2", pallas=False)
    got = buddy_select(p1, p2, bank, 1.0, 1.0, "l2", interpret=True,
                       n_tile=4, m_tile=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(golden), atol=1e-6)


def test_buddy_select_index_first_occurrence(rng):
    """`return_index=True` must yield FIRST-occurrence argmin indices on a
    duplicate-heavy bank (real images produce exact duplicate patches), and
    the returned vectors must be bit-exact bank rows at those indices.

    Round-4 regression: on real hardware Mosaic's native argmin picked
    LATER duplicates (0.23 first-occurrence agreement before the fix;
    post-fix sweep: ONCHIP_r04_buddy.log) —
    the kernel now computes min(col where score == min) explicitly, and
    gathers values outside the kernel so they are never rounded by MXU
    passes (the round-3 `row-agree 0.0000` confound)."""
    b, n, m, d = 2, 40, 70, 27
    p1 = jnp.asarray(np.round(rng.standard_normal((b, n, d)) * 32)
                     .astype(np.float32) / 255)
    p2 = jnp.asarray(np.round(rng.standard_normal((b, n, d)) * 32)
                     .astype(np.float32) / 255)
    bank_np = (np.round(rng.standard_normal((b, m, d)) * 32)
               .astype(np.float32) / 255)
    bank_np[:, m // 2:] = bank_np[:, : m - m // 2]  # exact duplicate block
    bank = jnp.asarray(bank_np)

    sel, idx = buddy_select(p1, p2, bank, interpret=True, return_index=True,
                            n_tile=16, m_tile=32)
    # f64 ground truth (np.argmin = first occurrence)
    def l2(p):
        p64, b64 = np.asarray(p, np.float64), np.asarray(bank_np, np.float64)
        pn = (p64**2).sum(-1)[:, :, None]
        bn = (b64**2).sum(-1)[:, None, :]
        return np.clip(pn + bn - 2 * np.einsum("bnd,bmd->bnm", p64, b64),
                       0, None)
    ref = np.argmin(l2(p1) + l2(p2), axis=2)
    np.testing.assert_array_equal(np.asarray(idx), ref)
    assert (np.asarray(idx) < m // 2).all()  # never the later duplicate
    np.testing.assert_array_equal(
        np.asarray(sel),
        np.take_along_axis(bank_np, np.asarray(idx)[..., None], axis=1),
    )


def test_buddy_select_alpha_beta(rng):
    b, n, m, d = 1, 8, 12, 9
    p1 = jnp.asarray(rng.random((b, n, d), dtype=np.float32))
    p2 = jnp.asarray(rng.random((b, n, d), dtype=np.float32))
    bank = jnp.asarray(rng.random((b, m, d), dtype=np.float32))
    golden = _buddy_select(p1, p2, bank, 0.3, 2.0, "l2", pallas=False)
    got = buddy_select(p1, p2, bank, 0.3, 2.0, "l2", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(golden), atol=1e-6)


def test_buddy_select_bf16_default_precision_bit_identical(rng):
    """The dtype-resolved precision default: on bf16 inputs a single
    DEFAULT MXU pass must select BIT-identically to HIGHEST (bf16 x bf16
    products are exact in the f32 accumulator; HIGHEST's split passes add
    exact zeros) — the 6x pass multiplier the round-4 profile found
    burning ~385 us/step in the gram-vgg recipe bought nothing. Near-tie
    rows (duplicate bank entries) are included to stress the claim."""
    b, n, m, d = 2, 64, 96, 9
    p1 = jnp.asarray(rng.random((b, n, d), dtype=np.float32), jnp.bfloat16)
    p2 = jnp.asarray(rng.random((b, n, d), dtype=np.float32), jnp.bfloat16)
    bank = jnp.asarray(rng.random((b, m, d), dtype=np.float32), jnp.bfloat16)
    bank = jnp.concatenate([bank, bank[:, :16]], axis=1)  # exact duplicates
    _, idx_def = buddy_select(p1, p2, bank, interpret=True, return_index=True)
    _, idx_hi = buddy_select(p1, p2, bank, interpret=True, return_index=True,
                             precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_array_equal(np.asarray(idx_def), np.asarray(idx_hi))
    # f32 inputs keep resolving to the reference-parity HIGHEST path
    _, idx_f32 = buddy_select(
        p1.astype(jnp.float32), p2.astype(jnp.float32),
        bank.astype(jnp.float32), interpret=True, return_index=True,
    )
    np.testing.assert_array_equal(np.asarray(idx_f32), np.asarray(idx_hi))


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

    @pytest.mark.parametrize("shape", [(2, 8, 8, 8, 4), (1, 24, 16, 16, 3)])
    def test_tiled_kernel_matches_one_block(self, rng, shape, monkeypatch):
        """The H-tiled double-buffered DMA variant (serving sizes, where
        the whole padded image can't live in VMEM) == the one-block
        kernel, forced by shrinking the dispatch budget to zero."""
        from srgan_st_tpu.kernels import coarse_conv as cc
        from srgan_st_tpu.ops.subpixel_conv import depth_to_space
        from jax import lax

        b, h, w, c, n2 = shape
        y = jnp.asarray(rng.random((b, h, w, c), dtype=np.float32))
        w2 = jnp.asarray(rng.random((5, 5, c, n2), dtype=np.float32) - 0.5)
        golden = lax.conv_general_dilated(
            y, w2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        monkeypatch.setattr(cc, "ONE_BLOCK_BYTES", 0)
        # a small tile budget forces several H tiles (th < hc) so the
        # double-buffer rotation and halo windows are actually exercised:
        # set it to the working set of th = hc//2 (same formula as
        # _pick_tile, which is monotone in th)
        hc, wc, c2, n3 = h // 2, w // 2, 2 * c, 4 * n2
        th0, wp8 = hc // 2, -(-(wc + 2) // 8) * 8
        budget = (2 * (th0 + 2) * 2 * wp8 * c2 * 2
                  + 4 * th0 * wc * c2 * 2 + 2 * th0 * wc * n3 * 4
                  + 18 * c2 * n3 * 2)
        monkeypatch.setattr(cc, "TILED_BUDGET_BYTES", budget)
        z = cc.coarse_conv_s2d(y, w2, interpret=True)
        th = cc._pick_tile(h // 2, w // 2, 2 * c, 4 * n2)
        assert th is not None and th < h // 2, th
        got = depth_to_space(z, 2)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(golden), atol=1e-4
        )

    def test_pallas_gate_is_one_block_only(self, rng, monkeypatch):
        """inner_factor='pallas' (what the generator auto resolves to)
        must dispatch the Pallas kernel ONLY inside the one-block
        (training-scale) envelope: at serving sizes the H-tiled kernel is
        a measured 2.3x END-TO-END loss (layout poisoning around the
        custom call, ONCHIP_r05_serving.log), so big inputs fall back to
        the XLA coarse conv and the tiled kernel is opt-in via
        inner_factor='pallas-tiled'."""
        import jax as jax_mod

        from srgan_st_tpu.kernels import coarse_conv as cc
        from srgan_st_tpu.ops import subpixel_conv as sc

        calls = []

        def fake_pallas(y, w, b):
            calls.append(tuple(y.shape))
            return sc._pre_shuffled_f2_reference(y, w, b)

        monkeypatch.setattr(sc, "_pre_shuffled_f2_pallas", fake_pallas)
        monkeypatch.setattr(jax_mod, "default_backend", lambda: "tpu")

        y = jnp.asarray(rng.random((1, 8, 8, 16), dtype=np.float32))
        w = jnp.asarray(rng.random((9, 9, 4, 3), dtype=np.float32) - 0.5)
        b = jnp.asarray(rng.random((3,), dtype=np.float32))
        golden = sc._pre_shuffled_f2_reference(y, w, b)

        # inside the one-block envelope: "pallas" dispatches the kernel
        got = sc.conv2d_subpixel_pre_shuffled(
            y, w, b, factor=2, inner_factor="pallas")
        assert calls == [(1, 8, 8, 16)]
        np.testing.assert_allclose(np.asarray(got), np.asarray(golden),
                                   atol=1e-5)

        # outside it (budget shrunk to zero): "pallas" must FALL BACK to
        # the XLA coarse conv, not reach the tiled kernel
        monkeypatch.setattr(cc, "ONE_BLOCK_BYTES", 0)
        calls.clear()
        got = sc.conv2d_subpixel_pre_shuffled(
            y, w, b, factor=2, inner_factor="pallas")
        assert calls == []
        np.testing.assert_allclose(np.asarray(got), np.asarray(golden),
                                   atol=1e-5)

        # "pallas-tiled" opts into the kernel wherever dispatch is
        # feasible (fits_budget: _pick_tile finds an H tile)
        got = sc.conv2d_subpixel_pre_shuffled(
            y, w, b, factor=2, inner_factor="pallas-tiled")
        assert calls == [(1, 8, 8, 16)]
        np.testing.assert_allclose(np.asarray(got), np.asarray(golden),
                                   atol=1e-5)


class TestFusedTrunk:
    """kernels/fused_trunk.py: the 16-RCB trunk as one Pallas kernel
    (interpret mode here; the real-TPU path shares the same code)."""

    def _args(self, rng, n=2, c=32):
        f = lambda *s: jnp.asarray(rng.standard_normal(s), np.float64).astype(  # noqa: E731
            jnp.float32
        )
        return (f(n, 3, 3, c, c) * 0.05, f(n, 3, 3, c, c) * 0.05,
                1 + 0.1 * f(n, c), 0.1 * f(n, c),
                1 + 0.1 * f(n, c), 0.1 * f(n, c), 0.25 + 0.01 * f(n))

    def test_f32_forward_and_grads_match_reference(self, rng):
        """At f32 the kernel + hand-written backward must match autodiff
        of the same math to fp tolerance — validates the BN/PReLU/conv
        backward formulas above the bf16 noise floor."""
        from srgan_st_tpu.kernels.fused_trunk import fused_trunk, trunk_reference

        args = self._args(rng)
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 32)), jnp.float32)
        y_ref, st_ref = trunk_reference(x, *args)
        y_k, st_k = fused_trunk(x, *args, 1e-5, True)
        np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(st_k), np.asarray(st_ref), atol=1e-5)

        def loss_k(x, *a):
            return jnp.sum(fused_trunk(x, *a, 1e-5, True)[0] ** 2)

        def loss_r(x, *a):
            return jnp.sum(trunk_reference(x, *a)[0] ** 2)

        gk = jax.grad(loss_k, argnums=tuple(range(8)))(x, *args)
        gr = jax.grad(loss_r, argnums=tuple(range(8)))(x, *args)
        for a, b in zip(gk, gr):
            scale = float(jnp.abs(b).max()) + 1e-9
            assert float(jnp.abs(a - b).max()) / scale < 1e-4

    def test_generator_fused_matches_unfused(self, rng):
        """Integrated: Generator(trunk_mode='fused_interpret') must match
        the unfused flax path — same variable tree, same batch-stat EMA,
        bf16-level forward agreement."""
        from srgan_st_tpu.models.generator import Generator

        g_un = Generator(channels=32, num_rcb=3, upscale=4,
                         dtype=jnp.bfloat16, trunk_mode="unfused")
        g_fu = Generator(channels=32, num_rcb=3, upscale=4,
                         dtype=jnp.bfloat16, trunk_mode="fused_interpret")
        lr = jnp.asarray(rng.random((2, 12, 12, 3), np.float32))
        v = g_un.init(jax.random.key(0), lr[:1], train=False)

        out_un, mut_un = g_un.apply(v, lr, train=True, mutable=["batch_stats"])
        out_fu, mut_fu = g_fu.apply(v, lr, train=True, mutable=["batch_stats"])
        assert (jax.tree_util.tree_structure(mut_un)
                == jax.tree_util.tree_structure(mut_fu))
        np.testing.assert_allclose(
            np.asarray(out_fu, np.float32), np.asarray(out_un, np.float32),
            atol=0.06,  # bf16 accumulation-order rounding through 3 blocks
        )
        for a, b in zip(jax.tree_util.tree_leaves(mut_un),
                        jax.tree_util.tree_leaves(mut_fu)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2)

        # eval mode must take the unfused path (running stats) regardless
        e1 = g_fu.apply(v, lr, train=False)
        e2 = g_un.apply(v, lr, train=False)
        np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


class TestPackedTrunk:
    """kernels/packed_trunk.py: the lane-packed fused trunk (fwd + bwd
    Pallas kernels; interpret mode here, same code on the real TPU)."""

    def _args(self, rng, n=2, c=32):
        f = lambda *s: jnp.asarray(rng.standard_normal(s), np.float64).astype(  # noqa: E731
            jnp.float32
        )
        return (f(n, 3, 3, c, c) * 0.05, f(n, 3, 3, c, c) * 0.05,
                1 + 0.1 * f(n, c), 0.1 * f(n, c),
                1 + 0.1 * f(n, c), 0.1 * f(n, c), 0.25 + 0.01 * f(n))

    def test_pack_roundtrip(self, rng):
        from srgan_st_tpu.kernels.packed_trunk import (
            _wpad, pack_image, unpack_image,
        )

        x = jnp.asarray(rng.random((2, 6, 10, 8), np.float32))
        wp = _wpad(10)
        y = pack_image(x, wp)
        assert y.shape == (2, 6, wp, 16)
        np.testing.assert_array_equal(np.asarray(unpack_image(y, 10)),
                                      np.asarray(x))

    def test_f32_forward_and_grads_match_reference(self, rng):
        """At f32 both Pallas kernels must match autodiff of the same math
        to fp tolerance — validates the packed conv/roll algebra, the
        in-kernel BN stats/backward, and the wgrad pack adjoint."""
        from srgan_st_tpu.kernels.fused_trunk import trunk_reference
        from srgan_st_tpu.kernels.packed_trunk import packed_trunk

        args = self._args(rng)
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 32)), jnp.float32)
        y_ref, st_ref = trunk_reference(x, *args)
        y_k, st_k = packed_trunk(x, *args, 1e-5, True)
        np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(st_k), np.asarray(st_ref), atol=1e-5)

        def loss_k(x, *a):
            return jnp.sum(packed_trunk(x, *a, 1e-5, True)[0] ** 2)

        def loss_r(x, *a):
            return jnp.sum(trunk_reference(x, *a)[0] ** 2)

        gk = jax.grad(loss_k, argnums=tuple(range(8)))(x, *args)
        gr = jax.grad(loss_r, argnums=tuple(range(8)))(x, *args)
        for a, b in zip(gk, gr):
            scale = float(jnp.abs(b).max()) + 1e-9
            assert float(jnp.abs(a - b).max()) / scale < 1e-4

    def test_odd_width_rejected(self, rng):
        """The W-parity pack requires even fine width."""
        from srgan_st_tpu.kernels.packed_trunk import packed_trunk

        args = self._args(rng, n=1, c=32)
        x = jnp.asarray(rng.standard_normal((1, 4, 6, 32)), jnp.float32)
        y, _ = packed_trunk(x, *args, 1e-5, True)  # even: fine
        assert y.shape == x.shape
        x_odd = jnp.asarray(rng.standard_normal((1, 4, 7, 32)), jnp.float32)
        with pytest.raises(ValueError):
            packed_trunk(x_odd, *args, 1e-5, True)

    def test_generator_packed_matches_unfused(self, rng):
        """Integrated: Generator(trunk_mode='packed_interpret') must match
        the unfused flax path — same variable tree, same batch-stat EMA,
        bf16-level forward agreement."""
        from srgan_st_tpu.models.generator import Generator

        g_un = Generator(channels=32, num_rcb=3, upscale=4,
                         dtype=jnp.bfloat16, trunk_mode="unfused")
        g_pk = Generator(channels=32, num_rcb=3, upscale=4,
                         dtype=jnp.bfloat16, trunk_mode="packed_interpret")
        lr = jnp.asarray(rng.random((2, 12, 12, 3), np.float32))
        v = g_un.init(jax.random.key(0), lr[:1], train=False)

        out_un, mut_un = g_un.apply(v, lr, train=True, mutable=["batch_stats"])
        out_pk, mut_pk = g_pk.apply(v, lr, train=True, mutable=["batch_stats"])
        assert (jax.tree_util.tree_structure(mut_un)
                == jax.tree_util.tree_structure(mut_pk))
        np.testing.assert_allclose(
            np.asarray(out_pk, np.float32), np.asarray(out_un, np.float32),
            atol=0.06,  # bf16 accumulation-order rounding through 3 blocks
        )
        for a, b in zip(jax.tree_util.tree_leaves(mut_un),
                        jax.tree_util.tree_leaves(mut_pk)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2)

        e1 = g_pk.apply(v, lr, train=False)
        e2 = g_un.apply(v, lr, train=False)
        np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))

    def test_warmup_step_packed_matches_unfused(self, rng):
        """Integration: a full jitted warmup step (steps.py) with
        TPU.TRUNK_MODE='packed_interpret' must match the unfused step from
        the same initial state — params, batch-stat EMA, and metrics."""
        from srgan_st_tpu.core.config import Config
        from srgan_st_tpu.losses.registry import build_warmup_criterions
        from srgan_st_tpu.models.generator import Generator
        from srgan_st_tpu.train.steps import (
            create_generator_state,
            make_g_optimizer,
            make_warmup_step,
        )

        def run(trunk_mode):
            config = Config()
            config.DATA.SYNTHETIC = True
            config.DATA.BATCH_SIZE = 4
            config.DATA.GT_IMAGE_SIZE = 32
            config.MODEL.G_N_RCB = 2
            config.MODEL.G_N_CHANNEL = 16
            config.TPU.TRUNK_MODE = trunk_mode
            g_model = Generator.from_config(config)
            g_tx = make_g_optimizer(config, 10, milestones=False)
            crits = build_warmup_criterions(config)
            state = create_generator_state(config, g_model, g_tx)
            step = jax.jit(make_warmup_step(config, g_model, crits, g_tx))
            batch = jnp.asarray(
                np.random.default_rng(3).integers(0, 256, (4, 32, 32, 3)),
                jnp.uint8,
            )
            for _ in range(2):
                state, metrics = step(state, batch)
            return state, metrics

        s_un, m_un = run("unfused")
        s_pk, m_pk = run("packed_interpret")
        assert abs(float(m_pk["G_Loss"]) - float(m_un["G_Loss"])) < 1e-5
        for a, b in zip(jax.tree_util.tree_leaves(s_un.g_params),
                        jax.tree_util.tree_leaves(s_pk.g_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(s_un.g_stats),
                        jax.tree_util.tree_leaves(s_pk.g_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=1e-4)

    def test_packed_gate_falls_back_out_of_envelope(self, rng):
        """trunk_mode='packed' outside the semantics gate (f32, 8-device
        CPU) must silently run the unfused path, bit-identical to it."""
        from srgan_st_tpu.models.generator import Generator

        g_un = Generator(channels=32, num_rcb=2, upscale=4, trunk_mode="unfused")
        g_pk = Generator(channels=32, num_rcb=2, upscale=4, trunk_mode="packed")
        lr = jnp.asarray(rng.random((2, 12, 12, 3), np.float32))
        v = g_un.init(jax.random.key(0), lr[:1], train=False)
        out_un, _ = g_un.apply(v, lr, train=True, mutable=["batch_stats"])
        out_pk, _ = g_pk.apply(v, lr, train=True, mutable=["batch_stats"])
        np.testing.assert_array_equal(np.asarray(out_un), np.asarray(out_pk))

    def test_packed_gate_shard_map_local_bn(self):
        """The semantics gate: shard_map (axis_name) + LOCAL_BN makes the
        packed trunk eligible; sync-BN or GSPMD multi-chip does not."""
        from srgan_st_tpu.models.generator import Generator

        x = jnp.zeros((2, 24, 24, 64), jnp.bfloat16)
        ok = Generator(dtype=jnp.bfloat16, axis_name="data", local_bn=True)
        assert ok._packed_ok(x)
        sync_bn = Generator(dtype=jnp.bfloat16, axis_name="data")
        assert not sync_bn._packed_ok(x)
        gspmd = Generator(dtype=jnp.bfloat16)  # 8-device CPU, no axis_name
        assert not gspmd._packed_ok(x)

    def test_forced_kernel_mode_syncbn_raises(self, rng):
        """An explicitly forced Pallas trunk mode under an axis_name with
        sync-BN must raise at trace time: both kernels compute per-shard
        stats in-VMEM, which would silently change the promised sync-BN
        normalization semantics. (Auto mode falls back instead — covered
        by test_packed_gate_shard_map_local_bn.)"""
        import pytest

        from srgan_st_tpu.models.generator import Generator

        lr = jnp.asarray(rng.random((2, 8, 8, 3), np.float32))
        for mode in ("packed_interpret", "fused_interpret"):
            g = Generator(channels=32, num_rcb=2, upscale=4,
                          axis_name="data", local_bn=False, trunk_mode=mode)
            v = g.init(jax.random.key(0), lr[:1], train=False)
            with pytest.raises(ValueError, match="per-shard batch stats"):
                g.apply(v, lr, train=True, mutable=["batch_stats"])

    def test_batchnorm_stats_sync_validated(self):
        """Unknown stats_sync values must error, not silently behave as
        'ema' (per-shard normalization) — a typo would otherwise change
        training numerics with no diagnostic."""
        import pytest

        from srgan_st_tpu.models.common import BatchNorm

        bn = BatchNorm(stats_sync="sync")
        with pytest.raises(ValueError, match="stats_sync"):
            bn.init(jax.random.key(0), jnp.zeros((2, 4, 4, 8)))

    def test_packed_shard_map_local_bn_matches_unfused(self, rng):
        """Under the explicit-SPMD path with LOCAL_BN the packed trunk must
        match the unfused local-BN path per shard — normalization with the
        per-shard stats the kernel computes in-VMEM, and the pmean'd
        global-moment running-stat EMA (generator.py _trunk)."""
        from jax.sharding import PartitionSpec as P

        from srgan_st_tpu.models.generator import Generator
        from srgan_st_tpu.parallel.mesh import make_mesh, shard_map_step

        mesh = make_mesh()
        lr = jnp.asarray(rng.random((16, 8, 8, 3), np.float32))

        def run(trunk_mode):
            g = Generator(channels=32, num_rcb=2, upscale=4,
                          axis_name="data", local_bn=True,
                          trunk_mode=trunk_mode)
            v = g.init(jax.random.key(0), lr[:1], train=False)

            def f(x):
                return g.apply(v, x, train=True, mutable=["batch_stats"])

            y, mut = jax.jit(
                shard_map_step(f, mesh, in_specs=P("data"),
                               out_specs=(P("data"), P()))
            )(lr)
            return np.asarray(y, np.float32), mut

        y_un, mut_un = run("unfused")
        y_pk, mut_pk = run("packed_interpret")
        np.testing.assert_allclose(y_pk, y_un, atol=1e-5)
        assert (jax.tree_util.tree_structure(mut_un)
                == jax.tree_util.tree_structure(mut_pk))
        for a, b in zip(jax.tree_util.tree_leaves(mut_un),
                        jax.tree_util.tree_leaves(mut_pk)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)


class TestXpackTrunk:
    """kernels/xpack_trunk.py — the W-parity packed trunk as PURE XLA
    convs (no Pallas, plain autodiff, GSPMD/sync-BN compatible)."""

    def _args(self, rng, n=2, c=32):
        f = lambda *s: jnp.asarray(rng.standard_normal(s), np.float64).astype(  # noqa: E731
            jnp.float32
        )
        return (f(n, 3, 3, c, c) * 0.05, f(n, 3, 3, c, c) * 0.05,
                1 + 0.1 * f(n, c), 0.1 * f(n, c),
                1 + 0.1 * f(n, c), 0.1 * f(n, c), 0.25 + 0.01 * f(n))

    def test_f32_forward_and_grads_match_reference(self, rng):
        """At f32 the packed-conv algebra must reproduce the fine-layout
        trunk (values, stats, and autodiff grads) to fp tolerance."""
        from srgan_st_tpu.kernels.fused_trunk import trunk_reference
        from srgan_st_tpu.kernels.xpack_trunk import xpack_trunk

        args = self._args(rng)
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 32)), jnp.float32)
        y_ref, st_ref = trunk_reference(x, *args)
        y_x, st_x = xpack_trunk(x, *args)
        np.testing.assert_allclose(np.asarray(y_x), np.asarray(y_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(st_x), np.asarray(st_ref), atol=1e-5)

        def loss_x(x, *a):
            return jnp.sum(xpack_trunk(x, *a)[0] ** 2)

        def loss_r(x, *a):
            return jnp.sum(trunk_reference(x, *a)[0] ** 2)

        gx = jax.grad(loss_x, argnums=tuple(range(8)))(x, *args)
        gr = jax.grad(loss_r, argnums=tuple(range(8)))(x, *args)
        for a, b in zip(gx, gr):
            scale = float(jnp.abs(b).max()) + 1e-9
            assert float(jnp.abs(a - b).max()) / scale < 1e-4

    def test_odd_width_falls_back(self, rng):
        """trunk_mode='xpack' at an odd trunk width silently runs the
        unfused path (bit-identical); the raw op rejects odd widths."""
        from srgan_st_tpu.kernels.xpack_trunk import xpack_trunk
        from srgan_st_tpu.models.generator import Generator

        args = self._args(rng, n=1, c=32)
        x_odd = jnp.asarray(rng.standard_normal((1, 4, 7, 32)), jnp.float32)
        with pytest.raises(ValueError):
            xpack_trunk(x_odd, *args)

        g_un = Generator(channels=32, num_rcb=2, upscale=4, trunk_mode="unfused")
        g_x = Generator(channels=32, num_rcb=2, upscale=4, trunk_mode="xpack")
        lr = jnp.asarray(rng.random((2, 7, 7, 3), np.float32))  # odd trunk W
        v = g_un.init(jax.random.key(0), lr[:1], train=False)
        out_un, _ = g_un.apply(v, lr, train=True, mutable=["batch_stats"])
        out_x, _ = g_x.apply(v, lr, train=True, mutable=["batch_stats"])
        np.testing.assert_array_equal(np.asarray(out_un), np.asarray(out_x))

    def test_warmup_step_xpack_matches_unfused(self, rng):
        """Integration: a full jitted warmup step with TPU.TRUNK_MODE=
        'xpack' must match the unfused step — params, batch-stat EMA,
        metrics (f32, so to fp tolerance)."""
        from srgan_st_tpu.core.config import Config
        from srgan_st_tpu.losses.registry import build_warmup_criterions
        from srgan_st_tpu.models.generator import Generator
        from srgan_st_tpu.train.steps import (
            create_generator_state,
            make_g_optimizer,
            make_warmup_step,
        )

        def run(trunk_mode):
            config = Config()
            config.DATA.SYNTHETIC = True
            config.DATA.BATCH_SIZE = 4
            config.DATA.GT_IMAGE_SIZE = 32
            config.MODEL.G_N_RCB = 2
            config.MODEL.G_N_CHANNEL = 16
            config.TPU.TRUNK_MODE = trunk_mode
            g_model = Generator.from_config(config)
            g_tx = make_g_optimizer(config, 10, milestones=False)
            crits = build_warmup_criterions(config)
            state = create_generator_state(config, g_model, g_tx)
            step = jax.jit(make_warmup_step(config, g_model, crits, g_tx))
            batch = jnp.asarray(
                np.random.default_rng(3).integers(0, 256, (4, 32, 32, 3)),
                jnp.uint8,
            )
            for _ in range(2):
                state, metrics = step(state, batch)
            return state, metrics

        s_un, m_un = run("unfused")
        s_x, m_x = run("xpack")
        assert abs(float(m_x["G_Loss"]) - float(m_un["G_Loss"])) < 1e-5
        for a, b in zip(jax.tree_util.tree_leaves(s_un.g_params),
                        jax.tree_util.tree_leaves(s_x.g_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(s_un.g_stats),
                        jax.tree_util.tree_leaves(s_x.g_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=1e-4)

    def test_xpack_shard_map_sync_bn_matches_unfused(self, rng):
        """The xpack differentiator vs the Pallas trunks: under shard_map
        WITHOUT LOCAL_BN it implements exact sync-BN (psum'd stat sums),
        so it must match the unfused flax sync-BN path — outputs and the
        batch-stat EMA."""
        from jax.sharding import PartitionSpec as P

        from srgan_st_tpu.models.generator import Generator
        from srgan_st_tpu.parallel.mesh import make_mesh, shard_map_step

        mesh = make_mesh()
        lr = jnp.asarray(rng.random((16, 8, 8, 3), np.float32))

        def run(trunk_mode):
            g = Generator(channels=32, num_rcb=2, upscale=4,
                          axis_name="data", local_bn=False,
                          trunk_mode=trunk_mode)
            v = g.init(jax.random.key(0), lr[:1], train=False)

            def f(x):
                return g.apply(v, x, train=True, mutable=["batch_stats"])

            y, mut = jax.jit(
                shard_map_step(f, mesh, in_specs=P("data"),
                               out_specs=(P("data"), P()))
            )(lr)
            return np.asarray(y, np.float32), mut

        y_un, mut_un = run("unfused")
        y_x, mut_x = run("xpack")
        np.testing.assert_allclose(y_x, y_un, atol=1e-5)
        assert (jax.tree_util.tree_structure(mut_un)
                == jax.tree_util.tree_structure(mut_x))
        for a, b in zip(jax.tree_util.tree_leaves(mut_un),
                        jax.tree_util.tree_leaves(mut_x)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)


class TestXpackTrunkEval:
    """kernels/xpack_trunk.py::xpack_trunk_eval — the eval-mode
    (running-average BN) packed trunk; BN folded into the conv weights."""

    def test_eval_matches_unfused_flax(self, rng):
        """Generator eval with trunk_mode='xpack' vs 'unfused' after a
        couple of train steps (non-trivial running stats): same output to
        fold/reassociation tolerance at f32."""
        from srgan_st_tpu.models.generator import Generator

        g_un = Generator(channels=32, num_rcb=3, upscale=4,
                         trunk_mode="unfused")
        g_x = Generator(channels=32, num_rcb=3, upscale=4,
                        trunk_mode="xpack")
        lr = jnp.asarray(rng.random((2, 8, 10, 3), np.float32))
        v = g_un.init(jax.random.key(0), lr[:1], train=False)
        # two train-mode applications to move the BN running stats off
        # their (0, 1) init so the eval fold is exercised for real
        for i in range(2):
            x = jnp.asarray(rng.random((2, 8, 10, 3), np.float32))
            _, upd = g_un.apply(v, x, train=True, mutable=["batch_stats"])
            v = {"params": v["params"], "batch_stats": upd["batch_stats"]}
        out_un = g_un.apply(v, lr, train=False)
        out_x = g_x.apply(v, lr, train=False)
        np.testing.assert_allclose(
            np.asarray(out_x), np.asarray(out_un), atol=2e-5
        )

    def test_eval_odd_width_falls_back(self, rng):
        """Odd trunk width: the generator silently runs the unfused eval
        trunk (bit-identical to trunk_mode='unfused'); the raw op raises."""
        from srgan_st_tpu.kernels.xpack_trunk import xpack_trunk_eval
        from srgan_st_tpu.models.generator import Generator

        n, c = 1, 32
        f = lambda *s: jnp.asarray(  # noqa: E731
            rng.standard_normal(s), jnp.float32
        )
        with pytest.raises(ValueError):
            xpack_trunk_eval(
                f(1, 4, 7, c), f(n, 3, 3, c, c), f(n, 3, 3, c, c),
                f(n, c), f(n, c), f(n, c), f(n, c), f(n),
                f(n, c), 1 + 0.1 * f(n, c) ** 2,
                f(n, c), 1 + 0.1 * f(n, c) ** 2,
            )

        g_un = Generator(channels=32, num_rcb=2, upscale=4,
                         trunk_mode="unfused")
        g_x = Generator(channels=32, num_rcb=2, upscale=4,
                        trunk_mode="xpack")
        lr = jnp.asarray(rng.random((1, 7, 7, 3), np.float32))
        v = g_un.init(jax.random.key(0), lr, train=False)
        np.testing.assert_array_equal(
            np.asarray(g_un.apply(v, lr, train=False)),
            np.asarray(g_x.apply(v, lr, train=False)),
        )


class TestHybridTrunk:
    """kernels/packed_trunk.py::hybrid_trunk — XLA forward + the packed
    Pallas backward (each direction's measured on-chip winner; the bwd
    kernel runs in interpret mode here, same code on the real TPU)."""

    def _args(self, rng, n=2, c=32):
        f = lambda *s: jnp.asarray(rng.standard_normal(s), np.float64).astype(  # noqa: E731
            jnp.float32
        )
        return (f(n, 3, 3, c, c) * 0.05, f(n, 3, 3, c, c) * 0.05,
                1 + 0.1 * f(n, c), 0.1 * f(n, c),
                1 + 0.1 * f(n, c), 0.1 * f(n, c), 0.25 + 0.01 * f(n))

    def test_f32_forward_and_grads_match_reference(self, rng):
        """At f32 the XLA forward and the packed backward must match
        autodiff of the same math to fp tolerance — validates that the
        forward's saved residuals (stats conventions, packed layouts)
        reproduce exactly what `_bwd_pallas` assumes."""
        from srgan_st_tpu.kernels.fused_trunk import trunk_reference
        from srgan_st_tpu.kernels.packed_trunk import hybrid_trunk

        args = self._args(rng)
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 32)), jnp.float32)
        y_ref, st_ref = trunk_reference(x, *args)
        y_h, st_h = hybrid_trunk(x, *args, 1e-5, True)
        np.testing.assert_allclose(np.asarray(y_h), np.asarray(y_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(st_h), np.asarray(st_ref), atol=1e-5)

        def loss_h(x, *a):
            return jnp.sum(hybrid_trunk(x, *a, 1e-5, True)[0] ** 2)

        def loss_r(x, *a):
            return jnp.sum(trunk_reference(x, *a)[0] ** 2)

        gh = jax.grad(loss_h, argnums=tuple(range(8)))(x, *args)
        gr = jax.grad(loss_r, argnums=tuple(range(8)))(x, *args)
        for a, b in zip(gh, gr):
            scale = float(jnp.abs(b).max()) + 1e-9
            assert float(jnp.abs(a - b).max()) / scale < 1e-4

    def test_odd_width_rejected(self, rng):
        from srgan_st_tpu.kernels.packed_trunk import hybrid_trunk

        args = self._args(rng, n=1, c=32)
        x_odd = jnp.asarray(rng.standard_normal((1, 4, 7, 32)), jnp.float32)
        with pytest.raises(ValueError):
            hybrid_trunk(x_odd, *args, 1e-5, True)

    def test_warmup_step_hybrid_matches_unfused(self, rng):
        """Integration: a full jitted warmup step with
        TPU.TRUNK_MODE='hybrid_interpret' must match the unfused step from
        the same initial state — params, batch-stat EMA, and metrics."""
        from srgan_st_tpu.core.config import Config
        from srgan_st_tpu.losses.registry import build_warmup_criterions
        from srgan_st_tpu.models.generator import Generator
        from srgan_st_tpu.train.steps import (
            create_generator_state,
            make_g_optimizer,
            make_warmup_step,
        )

        def run(trunk_mode):
            config = Config()
            config.DATA.SYNTHETIC = True
            config.DATA.BATCH_SIZE = 4
            config.DATA.GT_IMAGE_SIZE = 32
            config.MODEL.G_N_RCB = 2
            config.MODEL.G_N_CHANNEL = 16
            config.TPU.TRUNK_MODE = trunk_mode
            g_model = Generator.from_config(config)
            g_tx = make_g_optimizer(config, 10, milestones=False)
            crits = build_warmup_criterions(config)
            state = create_generator_state(config, g_model, g_tx)
            step = jax.jit(make_warmup_step(config, g_model, crits, g_tx))
            batch = jnp.asarray(
                np.random.default_rng(3).integers(0, 256, (4, 32, 32, 3)),
                jnp.uint8,
            )
            for _ in range(2):
                state, metrics = step(state, batch)
            return state, metrics

        s_un, m_un = run("unfused")
        s_h, m_h = run("hybrid_interpret")
        assert abs(float(m_h["G_Loss"]) - float(m_un["G_Loss"])) < 1e-5
        for a, b in zip(jax.tree_util.tree_leaves(s_un.g_params),
                        jax.tree_util.tree_leaves(s_h.g_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(s_un.g_stats),
                        jax.tree_util.tree_leaves(s_h.g_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=1e-4)

    def test_hybrid_gate_falls_back_out_of_envelope(self, rng):
        """trunk_mode='hybrid' outside the semantics gate (f32, 8-device
        CPU) must silently run the unfused path, bit-identical to it."""
        from srgan_st_tpu.models.generator import Generator

        g_un = Generator(channels=32, num_rcb=2, upscale=4, trunk_mode="unfused")
        g_h = Generator(channels=32, num_rcb=2, upscale=4, trunk_mode="hybrid")
        lr = jnp.asarray(rng.random((2, 12, 12, 3), np.float32))
        v = g_un.init(jax.random.key(0), lr[:1], train=False)
        out_un, _ = g_un.apply(v, lr, train=True, mutable=["batch_stats"])
        out_h, _ = g_h.apply(v, lr, train=True, mutable=["batch_stats"])
        np.testing.assert_array_equal(np.asarray(out_un), np.asarray(out_h))


class TestServingTail:
    """kernels/serving_tail.py: the fused [last upsample conv + PReLU +
    doubly-coarse conv3] H-tiled serving kernel (interpret mode; the
    real-TPU drive is tools/verify_tail_onchip.py)."""

    def _args(self, rng, b=1, h=8, w=8, c=64, n=3):
        f = lambda *s: jnp.asarray(  # noqa: E731
            rng.random(s, dtype=np.float32) - 0.5)
        return (f(b, h, w, c), f(3, 3, c, 4 * c), f(4 * c),
                jnp.float32(0.25), f(9, 9, c, n), f(n))

    @staticmethod
    def _golden(y, w_up, b_up, alpha, w3, b3):
        """The composed XLA eval tail the kernel reassociates: up-conv +
        PReLU on the pre-shuffle activation, then the fused
        reconstruction conv (generator's fuse_shuffle path)."""
        from jax import lax

        from srgan_st_tpu.ops.subpixel_conv import (
            conv2d_subpixel_pre_shuffled,
        )

        t = lax.conv_general_dilated(
            y, w_up, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b_up
        t = jnp.where(t >= 0, t, alpha * t)
        return conv2d_subpixel_pre_shuffled(t, w3, b3, factor=2,
                                            inner_factor=1)

    @pytest.mark.parametrize("shape", [(1, 8, 8), (2, 12, 16)])
    def test_matches_composed_tail(self, rng, shape):
        from srgan_st_tpu.kernels.serving_tail import serving_tail

        b, h, w = shape
        args = self._args(rng, b, h, w)
        golden = self._golden(*args)
        got = serving_tail(*args, interpret=True)
        assert got.shape == (b, 2 * h, 2 * w, 3)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(golden), atol=2e-4
        )

    def test_multi_tile_double_buffer(self, rng, monkeypatch):
        """Several H tiles (budget shrunk to the th = hc//2 working set):
        exercises the double-buffer rotation, the halo windows, and the
        top/bottom edge-row masking."""
        from srgan_st_tpu.kernels import serving_tail as st

        b, h, w, c, n = 2, 16, 8, 64, 3
        hc, wc, c2u, n3 = h // 2, w // 2, 2 * 4 * c, 16 * n
        th0 = hc // 2
        wp8 = -(-(wc + 3) // 8) * 8
        budget = (2 * (2 * th0 + 6) * wp8 * 128 * 2
                  + (th0 + 2) * 2 * (wc + 2) * c2u * 2
                  + 4 * wc * c2u * 4 + 4 * th0 * wc * c2u * 2
                  + 2 * th0 * wc * n3 * 4
                  + (6 * 128 * c2u + 18 * c2u * n3) * 2)
        monkeypatch.setattr(st, "TAIL_BUDGET_BYTES", budget)
        assert st._pick_tile(hc, wc, c2u, n3) == th0
        args = self._args(rng, b, h, w, c, n)
        golden = self._golden(*args)
        got = st.serving_tail(*args, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(golden), atol=2e-4
        )

    def test_generator_wiring_and_gates(self, rng):
        """Generator(tail_mode='fused'): identical param tree, eval
        output matches the composed path; the gate skips training steps
        and infeasible shapes (safe fallback, no error)."""
        from flax import traverse_util

        from srgan_st_tpu.models.generator import Generator

        g = Generator(num_rcb=2)
        gt = g.copy(tail_mode="fused")
        lr = jnp.asarray(rng.random((1, 6, 8, 3), dtype=np.float32))
        v = g.init(jax.random.key(0), lr, train=False)
        vt = gt.init(jax.random.key(0), lr, train=False)
        assert (set(traverse_util.flatten_dict(v["params"]))
                == set(traverse_util.flatten_dict(vt["params"])))

        base = g.apply(v, lr, train=False)
        tail = gt.apply(v, lr, train=False)
        np.testing.assert_allclose(
            np.asarray(tail), np.asarray(base), atol=2e-5
        )

        # gates: train=True and odd serving dims (x2 model, odd LR) must
        # fall back to the composed path without reaching the kernel
        from srgan_st_tpu.kernels import serving_tail as st_mod

        def boom(*a, **k):
            raise AssertionError("fused tail reached through a gate")

        orig = st_mod.serving_tail
        st_mod.serving_tail = boom
        try:
            out = gt.apply(v, lr, train=True,
                           mutable=["batch_stats"])[0]
            assert out.shape == (1, 24, 32, 3)
            g2 = Generator(num_rcb=2, upscale=2, tail_mode="fused")
            lr_odd = jnp.asarray(rng.random((1, 7, 9, 3), dtype=np.float32))
            v2 = g2.init(jax.random.key(0), lr_odd, train=False)
            out2 = g2.apply(v2, lr_odd, train=False)
            assert out2.shape == (1, 14, 18, 3)
        finally:
            st_mod.serving_tail = orig


@pytest.mark.tpu
@pytest.mark.skipif(os.environ.get("RUN_TPU_TESTS") != "1",
                    reason="opt-in: claims the real TPU chip "
                           "(RUN_TPU_TESTS=1)")
def test_buddy_select_real_kernel_on_chip():
    """Round-3 verdict item 1: the in-suite kernel tests run in interpret
    mode on the CPU mesh; this opt-in test runs the REAL Mosaic kernel on
    the chip in a subprocess (the suite process is pinned to CPU by
    conftest) and gates argmin-index agreement vs f64 ground truth AND
    vs the XLA path at >= 0.999 (measured envelope: 1.0000 normal /
    0.9999 duplicate-heavy — residuals are f32-vs-f64 rounding ties;
    ONCHIP_r04_buddy.log)."""
    import subprocess
    import sys as _sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # subprocess must see the axon TPU
    env["XLA_FLAGS"] = ""  # drop the 8-device CPU forcing
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [_sys.executable, os.path.join(root, "tools", "bench_buddy.py"),
         "--check", "--quick"],
        capture_output=True, text=True, timeout=1200, env=env,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "CHECK PASS" in proc.stdout, proc.stdout
