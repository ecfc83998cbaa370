from srgan_st_tpu.core.config import Config, dotdict, get_jobindex  # noqa: F401
