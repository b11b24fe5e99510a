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
import jax.numpy as jnp


def _up2x_axis(x: jax.Array, axis: int) -> jax.Array:
    """x2 half-pixel bilinear upsample along one axis (edge-clamped)."""
    n = x.shape[axis]
    prev = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 0, 1, axis=axis),
         jax.lax.slice_in_dim(x, 0, n - 1, axis=axis)], axis=axis)
    nxt = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, n, axis=axis),
         jax.lax.slice_in_dim(x, n - 1, n, axis=axis)], axis=axis)
    lo = 0.75 * x + 0.25 * prev   # output sample at 2i   (src coord i - 0.25)
    hi = 0.75 * x + 0.25 * nxt    # output sample at 2i+1 (src coord i + 0.25)
    stacked = jnp.stack([lo, hi], axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] = 2 * n
    return stacked.reshape(new_shape)


def upsample2x_bilinear(x: jax.Array) -> jax.Array:
    """x2 bilinear upsample of an NHWC tensor, align_corners=False."""
    return _up2x_axis(_up2x_axis(x, 1), 2)


def resize_bilinear(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """General bilinear resize (half-pixel centers) of an NHWC tensor."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (oh, ow) == (2 * h, 2 * w):
        return upsample2x_bilinear(x)
    return jax.image.resize(x, (b, oh, ow, c), method="bilinear")
