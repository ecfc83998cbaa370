from srgan_st_tpu.ops.resize import (  # noqa: F401
    resize_bicubic,
    nearest_upscale,
    matlab_resize_matrix,
    torch_resize_matrix,
)
from srgan_st_tpu.ops.structure_tensor import (  # noqa: F401
    gaussian_kernel,
    structure_tensor,
    structure_tensor_patches,
    st_normalize,
    inv_s1_x_s2,
    eigenvalues_2x2,
    riemannian_distance,
    st_distance,
)
from srgan_st_tpu.ops.pairwise import batch_pairwise_distance  # noqa: F401
from srgan_st_tpu.ops.patches import extract_patches  # noqa: F401
from srgan_st_tpu.ops.color import (  # noqa: F401
    rgb_to_grayscale,
    imagenet_normalize,
    bgr2ycbcr,
)
from srgan_st_tpu.ops.metrics import tensor2img, psnr, ssim  # noqa: F401
