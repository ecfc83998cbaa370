from srgan_st_tpu.eval.validate import validate, test, confidence_interval  # noqa: F401
