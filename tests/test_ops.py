"""Parity tests for the ops layer against torch-CPU golden values."""

import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from srgan_st_tpu import ops

# Stored golden fixtures: values computed once with torch-CPU
# implementations of the documented reference formulas (MATLAB-imresize
# bicubic weights, the six-conv2d structure-tensor pipeline, the reference
# pairwise distances) and cross-checked at generation time; see
# tests/goldens/README.md.
GOLD = np.load(os.path.join(os.path.dirname(__file__), "goldens", "reference_goldens.npz"))


class TestBicubic:
    @pytest.mark.parametrize("scale", [0.25, 0.5, 2.0, 4.0])
    def test_matlab_matches_reference(self, scale):
        x = GOLD[f"bicubic_in_{scale}"]
        golden = GOLD[f"bicubic_out_{scale}"]
        # ours is NHWC
        got = ops.resize_bicubic(jnp.asarray(x.transpose(0, 2, 3, 1)), scale, method="matlab")
        got = np.asarray(got).transpose(0, 3, 1, 2)
        # resampling matrices are bit-identical; the final round(255x)/255
        # quantization can flip by 1/255 on ties from fp32 accumulation order
        diff = np.abs(got - golden)
        assert diff.max() <= 1 / 255 + 1e-6
        assert (diff > 1e-6).mean() < 0.005  # <0.5% tie-flips

    @pytest.mark.parametrize("scale", [0.5, 0.25])
    def test_torch_interpolate_parity(self, rng, scale):
        x = rng.random((2, 3, 96, 96), dtype=np.float32)
        golden = F.interpolate(
            torch.from_numpy(x), scale_factor=scale, mode="bicubic", align_corners=False
        ).numpy()
        got = ops.resize_bicubic(jnp.asarray(x.transpose(0, 2, 3, 1)), scale, method="torch")
        got = np.asarray(got).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, golden, atol=2e-6)

    def test_quantization_applied(self, rng):
        x = rng.random((1, 3, 8, 8), dtype=np.float32).transpose(0, 2, 3, 1)
        out = np.asarray(ops.resize_bicubic(jnp.asarray(x), 0.5, method="matlab"))
        np.testing.assert_allclose(out, np.round(out * 255) / 255, atol=1e-7)

    def test_nearest(self, rng):
        x = rng.random((1, 4, 4, 3), dtype=np.float32)
        out = np.asarray(ops.nearest_upscale(jnp.asarray(x), 2))
        golden = (
            F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=2)
            .numpy()
            .transpose(0, 2, 3, 1)
        )
        np.testing.assert_allclose(out, golden)


class TestStructureTensor:
    @pytest.mark.parametrize("sigma,rho", [(0.5, 2.0), (1.0, 10.0)])
    def test_whole_image(self, sigma, rho):
        im = GOLD[f"st_in_{sigma}_{rho}"]
        golden = GOLD[f"st_out_{sigma}_{rho}"]
        got = np.asarray(ops.structure_tensor(jnp.asarray(im[None]), sigma, rho))[0]
        np.testing.assert_allclose(got, golden, atol=1e-5)

    def test_patches_match_whole_image(self):
        # banded-matrix patch path == conv path on a 3x3 "image"
        p = GOLD["st_patches_in"]
        got = np.asarray(ops.structure_tensor_patches(jnp.asarray(p), sigma=0.5, rho=2.0))
        np.testing.assert_allclose(got, GOLD["st_patches_out"], atol=1e-5)

    def test_normalize_inv_eig_distance(self):
        s1j = jnp.asarray(GOLD["stpipe_s1"])
        s2j = jnp.asarray(GOLD["stpipe_s2"])
        m = ops.inv_s1_x_s2(s1j, s2j, True)
        # torch stacking gives (4, H, W) with our same component order
        np.testing.assert_allclose(np.asarray(m), GOLD["stpipe_m"], rtol=2e-5, atol=1e-6)
        lam = ops.eigenvalues_2x2(m)
        # torch stacks (l1, l2) along dim1 -> (H, 2, W); ours is (2, H, W)
        np.testing.assert_allclose(
            np.asarray(lam), GOLD["stpipe_lam"].transpose(1, 0, 2), rtol=2e-5, atol=1e-6
        )
        d = ops.riemannian_distance(lam)
        np.testing.assert_allclose(np.asarray(d), GOLD["stpipe_d"], rtol=2e-5, atol=1e-6)

    def test_gaussian_kernel_values(self):
        g, dg = ops.gaussian_kernel(0.5, also_dg=True)
        np.testing.assert_allclose(g, GOLD["gauss_05"], atol=1e-7)
        np.testing.assert_allclose(dg, GOLD["gauss_05_dg"], atol=1e-6)
        assert len(ops.gaussian_kernel(2.0)) == 17  # radius 8


class TestPairwise:
    @pytest.mark.parametrize("norm", ["l1", "l2"])
    @pytest.mark.parametrize("with_y", [True, False])
    def test_parity(self, norm, with_y):
        key = f"pairwise_{norm}_{'y' if with_y else 'noy'}"
        x = GOLD[key + "_x"]
        y = GOLD[key + "_y"] if with_y else None
        got = np.asarray(
            ops.batch_pairwise_distance(
                jnp.asarray(x), jnp.asarray(y) if with_y else None, norm
            )
        )
        np.testing.assert_allclose(got, GOLD[key + "_out"], rtol=1e-5, atol=1e-5)


class TestPatches:
    def test_unfold_ordering(self, rng):
        x = rng.random((2, 3, 12, 12), dtype=np.float32)
        golden = (
            F.unfold(torch.from_numpy(x), kernel_size=3, padding=0, stride=3)
            .permute(0, 2, 1)
            .numpy()
        )
        got = np.asarray(ops.extract_patches(jnp.asarray(x.transpose(0, 2, 3, 1)), 3, 3))
        np.testing.assert_allclose(got, golden, atol=1e-7)

    def test_unfold_overlapping(self, rng):
        x = rng.random((1, 3, 10, 10), dtype=np.float32)
        golden = (
            F.unfold(torch.from_numpy(x), kernel_size=3, padding=0, stride=2)
            .permute(0, 2, 1)
            .numpy()
        )
        got = np.asarray(ops.extract_patches(jnp.asarray(x.transpose(0, 2, 3, 1)), 3, 2))
        np.testing.assert_allclose(got, golden, atol=1e-7)

    def test_patch_grids_match_tensor_unfold(self, rng):
        from srgan_st_tpu.ops.patches import extract_patch_grids

        x = torch.from_numpy(rng.random((2, 3, 12, 12), dtype=np.float32))
        # the reference's nested-unfold gymnastics (loss.py:193-195)
        g = x.unfold(1, 3, 3).unfold(2, 3, 3).unfold(3, 3, 3)
        g = g.squeeze().reshape(2, -1, 3, 3, 3).numpy()
        got = np.asarray(
            extract_patch_grids(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), 3)
        )
        np.testing.assert_allclose(got, g, atol=1e-7)


class TestColorMetrics:
    def test_bgr2ycbcr_float_and_uint8(self, rng):
        img_f = rng.random((8, 8, 3), dtype=np.float32)
        y = ops.bgr2ycbcr(img_f.copy(), only_y=True)
        golden = (
            np.dot(img_f.astype(np.float64) * 255, [24.966, 128.553, 65.481]) / 255.0 + 16.0
        ) / 255.0
        np.testing.assert_allclose(y, golden, rtol=1e-5, atol=1e-6)

        img_u = (rng.random((8, 8, 3)) * 255).astype(np.uint8)
        yu = ops.bgr2ycbcr(img_u.copy(), only_y=True)
        golden_u = np.round(
            np.dot(img_u.astype(np.float64), [24.966, 128.553, 65.481]) / 255.0 + 16.0
        ).astype(np.uint8)
        np.testing.assert_array_equal(yu, golden_u)

    def test_tensor2img(self, rng):
        x = rng.random((1, 7, 9, 3), dtype=np.float32) * 1.2 - 0.1  # out-of-range
        out = ops.tensor2img(x)
        assert out.dtype == np.uint8 and out.shape == (7, 9, 3)
        clamped = np.clip(x[0], 0, 1)
        np.testing.assert_array_equal(out, (clamped[..., ::-1] * 255).round().astype(np.uint8))

    def test_psnr_ssim_sanity(self, rng):
        a = (rng.random((32, 32)) * 255).astype(np.float64)
        assert ops.psnr(a, a) == float("inf")
        assert abs(ops.ssim(a, a) - 1.0) < 1e-9
        b = a + 10
        assert abs(ops.psnr(a, b) - (20 * np.log10(255 / 10))) < 1e-9
        assert ops.ssim(a, b) < 1.0

    def test_rgb_to_grayscale_matches_torchvision_coeffs(self, rng):
        x = rng.random((2, 4, 4, 3), dtype=np.float32)
        got = np.asarray(ops.rgb_to_grayscale(jnp.asarray(x)))
        golden = (
            0.2989 * x[..., 0:1] + 0.587 * x[..., 1:2] + 0.114 * x[..., 2:3]
        )
        np.testing.assert_allclose(got, golden, atol=1e-6)


class TestSubpixelConv:
    @pytest.mark.parametrize("f", [2, 4])
    def test_matches_direct_conv(self, rng, f):
        from jax import lax

        from srgan_st_tpu.ops.subpixel_conv import conv2d_subpixel

        x = jnp.asarray(rng.random((2, 24, 36, 16), dtype=np.float32))
        w = jnp.asarray(rng.random((9, 9, 16, 3), dtype=np.float32) - 0.5)
        b = jnp.asarray(rng.random((3,), dtype=np.float32))
        golden = lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b
        got = conv2d_subpixel(x, w, b, factor=f)
        np.testing.assert_allclose(np.asarray(got), np.asarray(golden),
                                   rtol=1e-4, atol=1e-5)

    def test_odd_size_falls_back(self, rng):
        from srgan_st_tpu.ops.subpixel_conv import conv2d_subpixel

        x = jnp.asarray(rng.random((1, 15, 17, 4), dtype=np.float32))
        w = jnp.asarray(rng.random((9, 9, 4, 3), dtype=np.float32))
        out = conv2d_subpixel(x, w, None, factor=2)
        assert out.shape == (1, 15, 17, 3)

    def test_gradients_match(self, rng):
        import jax
        from jax import lax

        from srgan_st_tpu.ops.subpixel_conv import conv2d_subpixel

        x = jnp.asarray(rng.random((1, 8, 8, 8), dtype=np.float32))
        w = jnp.asarray(rng.random((9, 9, 8, 3), dtype=np.float32) - 0.5)

        def loss_sub(w):
            return (conv2d_subpixel(x, w, None, 2) ** 2).sum()

        def loss_direct(w):
            return (lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            ) ** 2).sum()

        np.testing.assert_allclose(
            np.asarray(jax.grad(loss_sub)(w)),
            np.asarray(jax.grad(loss_direct)(w)),
            rtol=1e-3, atol=1e-3,
        )
