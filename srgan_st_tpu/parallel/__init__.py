from srgan_st_tpu.parallel.mesh import make_mesh, batch_sharding, replicated  # noqa: F401
