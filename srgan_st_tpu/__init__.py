"""srgan_st_tpu: a TPU-native single-image super-resolution framework.

Built from scratch in JAX/Flax with XLA/Pallas kernels, providing the
capabilities of the SRGAN-ST reference (see SURVEY.md): SRResNet generator,
SRGAN discriminator, a pluggable zoo of generator criterions (pixel, VGG19
content, discriminator-feature content, adversarial, Best-Buddy, Gram,
patchwise structure-tensor and whole-image structure-tensor losses), a
two-stage training recipe (pixel warmup then GAN training), MATLAB-compatible
bicubic resampling, patch-tiling data prep, and Y-channel PSNR/SSIM
evaluation — with data-parallel sharding over a `jax.sharding.Mesh`.

Layout convention: images are NHWC float32 in [0, 1] (TPU-preferred),
unlike the reference's NCHW.
"""

__version__ = "0.1.0"

from srgan_st_tpu.core.config import Config  # noqa: F401
