from srgan_st_tpu.losses.registry import build_criterions, build_warmup_criterions  # noqa: F401
from srgan_st_tpu.losses.functions import (  # noqa: F401
    pixel_loss,
    adversarial_loss,
    best_buddy_loss,
    gram_loss,
    patchwise_st_loss,
    st_loss,
    content_loss_vgg,
    content_loss_discriminator,
)
