from srgan_st_tpu.train.warmup import warmup  # noqa: F401
from srgan_st_tpu.train.train import train  # noqa: F401
from srgan_st_tpu.train.steps import (  # noqa: F401
    GANTrainState,
    create_gan_state,
    create_generator_state,
    make_gan_steps,
    make_warmup_step,
    make_g_optimizer,
    make_d_optimizer,
)
