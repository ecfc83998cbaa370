from srgan_st_tpu.viz.buddy_illustration import buddy_illustration  # noqa: F401
from srgan_st_tpu.viz.save_image_patch import save_image_patch  # noqa: F401
