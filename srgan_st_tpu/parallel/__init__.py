from srgan_st_tpu.parallel.distributed import (  # noqa: F401
    initialize_distributed,
    is_coordinator,
    process_slice,
)
from srgan_st_tpu.parallel.mesh import make_mesh, batch_sharding, replicated  # noqa: F401
