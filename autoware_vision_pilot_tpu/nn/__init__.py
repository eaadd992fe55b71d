from .layers import (
    Conv2d,
    ConvTranspose2d,
    Linear,
    BatchNorm2d,
    max_pool2d,
    gelu,
    silu,
)
