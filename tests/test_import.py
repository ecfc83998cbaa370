"""Torch-checkpoint import shim tests: full model-forward parity.

A randomly-initialized torch SRResNet / SRGAN discriminator (golden
implementations of the documented reference architectures) is exported as a
state dict, imported via tools/import_torch_checkpoint.py, and the flax
models must reproduce the torch forward outputs — the strongest parity
guarantee short of running the reference itself (enables bit-comparable
PSNR/SSIM evaluation of reference-trained weights on TPU)."""

import numpy as np
import torch

import jax.numpy as jnp

from srgan_st_tpu.models.discriminator import Discriminator
from srgan_st_tpu.models.generator import Generator
from tests.reference_impls import TorchSRGANDiscriminator, TorchSRResNet

# tools/ is on sys.path via conftest (repo-relative, cwd-safe)
from import_torch_checkpoint import (  # noqa: E402
    _strip_compile_prefix,
    import_discriminator,
    import_generator,
)


def _np_state(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


class TestGeneratorImport:
    def test_forward_parity(self, rng):
        torch.manual_seed(0)
        tg = TorchSRResNet(num_rcb=3, channels=16, upscale=4).eval()
        variables = import_generator(_np_state(tg), num_rcb=3)

        x = rng.random((2, 3, 12, 12), dtype=np.float32)
        with torch.no_grad():
            golden = tg(torch.from_numpy(x)).numpy()

        g = Generator(channels=16, num_rcb=3, upscale=4)
        got = g.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            train=False,
        )
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), golden, atol=2e-5
        )

    def test_param_tree_is_complete(self):
        torch.manual_seed(1)
        tg = TorchSRResNet().eval()
        variables = import_generator(_np_state(tg), num_rcb=16)
        g = Generator()
        import jax

        ref = g.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)), train=False)
        ref_shapes = jax.tree.map(lambda a: a.shape, ref["params"])
        got_shapes = jax.tree.map(lambda a: np.asarray(a).shape, variables["params"])
        assert ref_shapes == got_shapes

    def test_compile_prefix_stripped(self):
        state = {"_orig_mod.conv3.weight": np.zeros((3, 64, 9, 9), np.float32)}
        out = _strip_compile_prefix(state)
        assert list(out) == ["conv3.weight"]


class TestDiscriminatorImport:
    def test_forward_parity(self, rng):
        torch.manual_seed(0)
        td = TorchSRGANDiscriminator(channels=16).eval()
        variables = import_discriminator(_np_state(td), channels=16)

        x = rng.random((2, 3, 96, 96), dtype=np.float32)
        with torch.no_grad():
            golden = td(torch.from_numpy(x)).numpy()

        d = Discriminator(channels=16)
        got = d.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            train=False,
        )
        np.testing.assert_allclose(np.asarray(got), golden, atol=3e-4, rtol=1e-4)
