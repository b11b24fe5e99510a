"""U-Net discriminator with spectral normalization.

The reference instantiates this architecture from basicsr's ARCH_REGISTRY
(``Train/options/train.yml:54-61``; it is not defined in the reference repo
itself): ``net_d`` judges 3-channel glyph/char crops and ``net_srd`` judges
6-channel (SR crop, prior glyph) pairs. Standard Real-ESRGAN U-Net critic:
3 stride-2 down convs (x2 channels each), bilinear x2 up path with skip
additions, two 3x3 refinements and a 1-channel head; all inner convs are
spectrally normalized and bias-free.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from marconet_tpu.ops.layers import Conv, SNConv, leaky_relu
from marconet_tpu.ops.resize import upsample2x_bilinear

Dtype = Any


class UNetDiscriminatorSN(nn.Module):
    num_feat: int = 64
    skip_connection: bool = True
    update_stats: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) with H, W divisible by 8. Returns (B, H, W, 1)."""
        f = self.num_feat
        us, dt = self.update_stats, self.dtype

        def sn(feats, k, s, name):
            # every conv here uses torch padding=1 (k is 3 or 4)
            return SNConv(feats, kernel_size=(k, k), strides=(s, s),
                          padding=((1, 1), (1, 1)), use_bias=False,
                          update_stats=us, dtype=dt, name=name)

        x0 = leaky_relu(Conv(f, dtype=dt, name="conv0")(x))
        x1 = leaky_relu(sn(f * 2, 4, 2, "conv1")(x0))
        x2 = leaky_relu(sn(f * 4, 4, 2, "conv2")(x1))
        x3 = leaky_relu(sn(f * 8, 4, 2, "conv3")(x2))

        x4 = leaky_relu(sn(f * 4, 3, 1, "conv4")(upsample2x_bilinear(x3)))
        if self.skip_connection:
            x4 = x4 + x2
        x5 = leaky_relu(sn(f * 2, 3, 1, "conv5")(upsample2x_bilinear(x4)))
        if self.skip_connection:
            x5 = x5 + x1
        x6 = leaky_relu(sn(f, 3, 1, "conv6")(upsample2x_bilinear(x5)))
        if self.skip_connection:
            x6 = x6 + x0

        out = leaky_relu(sn(f, 3, 1, "conv7")(x6))
        out = leaky_relu(sn(f, 3, 1, "conv8")(out))
        return Conv(1, dtype=dt, name="conv9")(out)
