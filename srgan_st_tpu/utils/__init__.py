from srgan_st_tpu.utils.profiling import ThroughputMeter, trace_context  # noqa: F401
from srgan_st_tpu.utils.debugging import check_finite_tree, nan_guard  # noqa: F401
