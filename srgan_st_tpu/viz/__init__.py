from srgan_st_tpu.viz.save_image_patch import save_image_patch  # noqa: F401
