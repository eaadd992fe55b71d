from .preprocess import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    resize_bilinear,
    preprocess_imagenet,
    letterbox,
)
from .postprocess import (
    argmax_mask,
    colorize_mask,
    threshold_channels,
    depth_minmax_scale,
    nms_fixed,
    blend_overlay,
)
from .smallsolve import solve3x3
