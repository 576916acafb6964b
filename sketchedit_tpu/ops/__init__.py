from sketchedit_tpu.ops.gated_conv import (
    gated_conv2d,
    gated_deconv2d,
    leaky_conv2d,
    init_conv_params,
)
from sketchedit_tpu.ops.image import (
    nearest_upsample2x,
    avg_pool2d,
    max_pool2d,
    nearest_resize,
    gaussian_blur3x3,
)
from sketchedit_tpu.ops.attention import (
    contextual_attention,
    extract_patches,
    fold_patches,
)
