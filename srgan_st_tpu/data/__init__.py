from srgan_st_tpu.data.pipeline import (  # noqa: F401
    TrainPatchSource,
    SyntheticPatchSource,
    PackedPatchSource,
    TestPairSource,
    make_train_source,
)
