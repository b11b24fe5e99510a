from marconet_tpu.ops.fused_act import fused_leaky_relu
from marconet_tpu.ops.layers import (
    EqualLinear,
    PixelNorm,
    GroupNorm,
    SNConv,
    ResTextBlockV2,
    adaptive_instance_norm,
    masked_mean_std,
)
from marconet_tpu.ops.modconv import ModulatedConv2d, StyledConv, ToRGB
from marconet_tpu.ops.resize import upsample2x_bilinear, resize_bilinear

__all__ = [
    "fused_leaky_relu",
    "EqualLinear",
    "PixelNorm",
    "GroupNorm",
    "SNConv",
    "ResTextBlockV2",
    "adaptive_instance_norm",
    "masked_mean_std",
    "ModulatedConv2d",
    "StyledConv",
    "ToRGB",
    "upsample2x_bilinear",
    "resize_bilinear",
]
