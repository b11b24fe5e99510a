"""StyleGAN2-flavoured modulated convolution, TPU-first.

The reference (``models/networks.py:249-302``) implements modulation by
materializing a per-sample weight tensor and running a grouped conv with
``groups=batch`` — a pattern that maps poorly to the MXU. Because the conv is
linear in its weight, the modulation/demodulation factors can be folded into
the activations instead:

    conv(x, scale*W*s[b] * d[b]) == d[b] * conv(x * s[b], scale*W)

so we run **one shared-weight batched conv** (ideal MXU shape) with an
elementwise channel pre-scale and post-scale. This is numerically exact
(same sum, reassociated) and is the idiomatic TPU formulation.

Quirks preserved for checkpoint parity:
- upsampling is bilinear x2 *before* the conv (reference ``networks.py:268,
  291-296``), never upfirdn2d; ``blur_kernel`` is accepted but unused.
- ``StyledConv`` adds two biases (its own + the FusedLeakyReLU's) before the
  sqrt(2)-scaled LeakyReLU (reference ``networks.py:240-246``).
- ``ToRGB`` applies tanh on every skip-summed output (reference
  ``networks.py:305-321``).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from marconet_tpu.ops.fused_act import fused_leaky_relu
from marconet_tpu.ops.layers import EqualLinear
from marconet_tpu.ops.resize import upsample2x_bilinear

Dtype = Any


class ModulatedConv2d(nn.Module):
    """Style-modulated conv with activation-folded (de)modulation."""

    features: int
    kernel_size: int = 3
    demodulate: bool = True
    upsample: bool = False
    # emit (B, O, H, W) channels-major output (1x1 convs only): the
    # lane-efficient layout for few-channel outputs like RGB — see ToRGB
    channels_major_out: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, style):
        """x: (B, H, W, I) NHWC; style: (B, style_dim)."""
        in_features = x.shape[-1]
        k = self.kernel_size
        # torch init: randn(1, O, I, k, k); stored here as HWIO
        weight = self.param(
            "weight",
            lambda key, shape: jax.random.normal(key, shape),
            (k, k, in_features, self.features),
        )
        # style -> per-input-channel modulation (bias_init=1)
        s = EqualLinear(in_features, bias_init_val=1.0, dtype=self.dtype,
                        name="modulation")(style)  # (B, I)
        scale = 1.0 / jnp.sqrt(jnp.asarray(in_features * k * k,
                                           jnp.float32))
        w = (weight * scale).astype(self.dtype)

        if self.demodulate:
            # d[b, o] = rsqrt(sum_{k,k,i} (scale * W * s[b,i])^2 + 1e-8)
            w2 = jnp.square(weight.astype(jnp.float32) *
                            scale.astype(jnp.float32))
            # (B, O) = s^2 (B, I) . sum_khw W^2 (I, O)
            demod = jax.lax.rsqrt(
                jnp.einsum("bi,io->bo", jnp.square(s.astype(jnp.float32)),
                           w2.sum(axis=(0, 1))) + 1e-8).astype(self.dtype)

        x = x.astype(self.dtype) * s[:, None, None, :]
        use_phase_up = self.upsample and k == 3 and x.shape[1] >= 32 \
            and in_features <= 128
        if use_phase_up:
            # TPU layout optimization only: on CPU (the test/dryrun
            # tier) the phase form just inflates XLA:CPU compile time.
            # MARCONET_PHASE_UPCONV=0/1 forces either way (tests pin the
            # phase path on CPU through the =1 override).
            env = os.environ.get("MARCONET_PHASE_UPCONV")
            use_phase_up = env == "1" if env is not None \
                else jax.default_backend() == "tpu"
        if self.channels_major_out:
            assert k == 1 and not self.upsample
            # contraction straight into (B, O, H, W): the write is
            # lane-full (W minor) even for O=3
            y = jnp.einsum("bhwi,io->bohw", x, w[0, 0],
                           preferred_element_type=jnp.float32
                           ).astype(self.dtype)
            if self.demodulate:
                y = y * demod[:, :, None, None]
            return y
        if use_phase_up:
            # exact fused upsample+conv in the phase-separated layout
            # (ops/phase.py): one plain 3x3 conv with a (3,3,I,4O) kernel
            # on the low-res grid replaces the bandwidth-bound bilinear
            # intermediate AND keeps the MXU contraction full-width —
            # same FLOPs as the hi-res conv (no dilated-kernel
            # inflation). Gated to >=32 input rows AND <=128 input
            # channels: measured on v5e, the phase form wins only where
            # the plain conv is layout-starved (final_b-class shapes);
            # at the 256-512-ch generator sites the unpack relayout +
            # border machinery cost more than the upsample they remove
            # (conv_64 pair 14.1 -> 17.3 ms, conv_128 17.4 -> 19.6;
            # BENCH_NOTES.md round 3).
            from marconet_tpu.ops.phase import (
                conv3x3_after_upsample2x_phase, phase_unpack)
            y = phase_unpack(conv3x3_after_upsample2x_phase(x, w))
        else:
            if self.upsample:
                x = upsample2x_bilinear(x)
            pad = k // 2
            y = jax.lax.conv_general_dilated(
                x, w,
                window_strides=(1, 1),
                padding=((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.demodulate:
            y = y * demod[:, None, None, :]
        return y


class StyledConv(nn.Module):
    """ModulatedConv2d + bias + FusedLeakyReLU (with its own bias)."""

    features: int
    kernel_size: int = 3
    upsample: bool = False
    demodulate: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, style):
        y = ModulatedConv2d(self.features, self.kernel_size,
                            demodulate=self.demodulate,
                            upsample=self.upsample, dtype=self.dtype,
                            name="conv")(x, style)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        act_bias = self.param("act_bias", nn.initializers.zeros,
                              (self.features,))
        # Both biases are added pre-activation; fold into one fused op.
        return fused_leaky_relu(y, (bias + act_bias).astype(y.dtype))


class ToRGB(nn.Module):
    """1x1 modulated conv to RGB with tanh'd skip accumulation.

    ``channels_major=True`` runs the whole skip chain in (B, 3, H, W)
    layout (skip taken and returned channels-major): an NHWC RGB tensor
    occupies 3 of 128 vector lanes, so the chain's tanh/add/upsample
    steps — repeated at every resolution — run at ~2% VPU efficiency,
    while channels-major keeps W in the lanes and upsamples via MXU
    blend matmuls (``ops/resize.upsample2x_bilinear_cm``). Identical
    parameters and numerics either way.
    """

    upsample: bool = True
    channels_major: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, style, skip: Optional[jax.Array] = None):
        y = ModulatedConv2d(3, kernel_size=1, demodulate=False,
                            channels_major_out=self.channels_major,
                            dtype=self.dtype, name="conv")(x, style)
        bias = self.param("bias", nn.initializers.zeros, (3,))
        if self.channels_major:
            y = y + bias.astype(y.dtype)[None, :, None, None]
            if skip is not None:
                if self.upsample:
                    from marconet_tpu.ops.resize import \
                        upsample2x_bilinear_cm
                    skip = upsample2x_bilinear_cm(skip)
                y = y + skip
            return jnp.tanh(y)
        y = y + bias.astype(y.dtype)
        if skip is not None:
            if self.upsample:
                skip = upsample2x_bilinear(skip)
            y = y + skip
        return jnp.tanh(y)
