from srgan_st_tpu.models.generator import Generator  # noqa: F401
from srgan_st_tpu.models.discriminator import Discriminator  # noqa: F401
from srgan_st_tpu.models.baselines import BicubicUpscaler, NearestNeighbourUpscaler  # noqa: F401
