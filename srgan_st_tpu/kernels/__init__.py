from srgan_st_tpu.kernels.buddy_select import buddy_select  # noqa: F401
