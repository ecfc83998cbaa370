"""ops/fastgrad.py: hand-scheduled backwards must match autodiff exactly
in the forward and to fp tolerance (pure reassociation) in the backward."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn

from srgan_st_tpu.ops.fastgrad import StemConv3x3, _conv3x3_same, stem_conv3x3


@pytest.fixture
def rng():
    return np.random.default_rng(11)


class TestStemConv:
    def test_forward_exact(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 12, 12, 3), np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, 3, 16), np.float32))
        b = jnp.asarray(rng.standard_normal((16,), np.float32))
        np.testing.assert_array_equal(
            np.asarray(stem_conv3x3(x, w, b)), np.asarray(_conv3x3_same(x, w, b))
        )

    def test_grads_match_autodiff(self, rng):
        """dx via the packed GEMM + overlap-add == XLA's transposed-conv dx
        (f32 reassociation only); dw/db exact (same lowering)."""
        x = jnp.asarray(rng.standard_normal((2, 10, 14, 3), np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, 3, 8), np.float32))
        b = jnp.asarray(rng.standard_normal((8,), np.float32))
        ct = jnp.asarray(rng.standard_normal((2, 10, 14, 8), np.float32))

        def loss(fn):
            return lambda x_, w_, b_: (fn(x_, w_, b_) * ct).sum()

        gx, gw, gb = jax.grad(loss(stem_conv3x3), (0, 1, 2))(x, w, b)
        rx, rw, rb = jax.grad(loss(_conv3x3_same), (0, 1, 2))(x, w, b)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=1e-5, atol=1e-5)

    def test_biasless_grad(self, rng):
        """b=None is a legal forward; its backward must return a None
        cotangent (an array db against a None input is a custom_vjp
        structure mismatch crash)."""
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 3), np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, 3, 8), np.float32))
        gx, gw = jax.grad(
            lambda x_, w_: stem_conv3x3(x_, w_, None).sum(), (0, 1)
        )(x, w)
        rx, rw = jax.grad(
            lambda x_, w_: _conv3x3_same(x_, w_, None).sum(), (0, 1)
        )(x, w)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), rtol=1e-5, atol=1e-5)

    def test_image_grad_rejects_non_3x3(self, rng):
        """The overlap-add offsets are 3x3 constants; a 5x5 kernel would
        silently wrap slices from the array end instead of erroring."""
        import pytest

        from srgan_st_tpu.ops.fastgrad import stem_image_grad

        ct = jnp.asarray(rng.standard_normal((1, 8, 8, 4), np.float32))
        w5 = jnp.asarray(rng.standard_normal((5, 5, 3, 4), np.float32))
        with pytest.raises(ValueError, match="3x3-only"):
            stem_image_grad(ct, w5)

    def test_module_params_match_nn_conv(self, rng):
        """Same name/init/shape param tree as the nn.Conv it replaces, and
        the same forward (CPU path) — checkpoints stay interchangeable."""
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 3), np.float32))
        stem = StemConv3x3(16, name="conv0")
        ref = nn.Conv(16, (3, 3), padding=1, name="conv0")
        v1 = stem.init(jax.random.key(0), x)
        v2 = ref.init(jax.random.key(0), x)
        assert jax.tree.map(jnp.shape, v1) == jax.tree.map(jnp.shape, v2)
        for leaf1, leaf2 in zip(jax.tree.leaves(v1), jax.tree.leaves(v2)):
            np.testing.assert_array_equal(np.asarray(leaf1), np.asarray(leaf2))
        np.testing.assert_allclose(
            np.asarray(stem.apply(v1, x)), np.asarray(ref.apply(v2, x)),
            rtol=1e-6, atol=1e-6,
        )


class TestVGGFrozenPair:
    """models/vgg.py make_vgg19_frozen_pair: the batch-concatenated
    forward + hand-written sr-only backward must reproduce the plain
    two-forward autodiff path (values and sr-gradient)."""

    def test_matches_two_forward_path(self, rng):
        from srgan_st_tpu.losses.functions import content_loss_vgg
        from srgan_st_tpu.models.vgg import VGG19Features, make_vgg19_frozen_pair

        taps = ("features.17", "features.26", "features.35")
        weights = {t: 1.0 / (i + 1) for i, t in enumerate(taps)}
        model = VGG19Features(taps=taps)
        # 48px keeps all taps alive at a quarter of the CPU cost
        variables = model.init(jax.random.key(0), jnp.zeros((1, 48, 48, 3)))
        pair = make_vgg19_frozen_pair(variables, taps, jnp.float32)
        sr = jnp.asarray(rng.random((2, 48, 48, 3), np.float32))
        gt = jnp.asarray(rng.random((2, 48, 48, 3), np.float32))

        ref_fn = lambda s: content_loss_vgg(  # noqa: E731
            s, gt, vgg_apply=lambda x: model.apply(variables, x),
            layer_weights=weights)
        pair_fn = lambda s: content_loss_vgg(  # noqa: E731
            s, gt, vgg_pair=pair, layer_weights=weights)

        v_ref, g_ref = jax.value_and_grad(ref_fn)(sr)
        v_pair, g_pair = jax.value_and_grad(pair_fn)(sr)
        np.testing.assert_allclose(float(v_pair), float(v_ref), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(g_pair), np.asarray(g_ref), rtol=1e-4, atol=1e-7
        )

    def test_gt_and_params_receive_no_gradient(self, rng):
        """The frozen-pair contract: d/d gt is exactly zero."""
        from srgan_st_tpu.models.vgg import VGG19Features, make_vgg19_frozen_pair

        taps = ("features.3",)
        model = VGG19Features(taps=taps)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
        pair = make_vgg19_frozen_pair(variables, taps, jnp.float32)
        sr = jnp.asarray(rng.random((1, 8, 8, 3), np.float32))
        gt = jnp.asarray(rng.random((1, 8, 8, 3), np.float32))
        g = jax.grad(
            lambda g_: (pair(sr, g_)[0]["features.3"]
                        - pair(sr, g_)[1]["features.3"]).sum()
        )(gt)
        np.testing.assert_array_equal(np.asarray(g), 0.0)
