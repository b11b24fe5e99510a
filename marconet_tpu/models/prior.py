"""Structure-prior generator: character-codebook StyleGAN.

Given a font-style vector ``w`` and character labels, synthesizes a
128x128 glyph "structure prior" per character plus intermediate features at
64x64 (256ch) and 32x32 (512ch) for SFT fusion in the SR network.

Parity target: ``TSPGAN``/``TextGenerator`` in reference
``models/networks.py:51-164`` — 27.97 M parameters. Quirks preserved:
- no noise injection (reference passes noise=None throughout, ``:144-151``);
- bilinear (not upfirdn2d) upsampling; ``blur_kernel`` unused;
- tanh applied by every ToRGB (``:321``);
- style MLP = PixelNorm + 8 x EqualLinear(lr_mul=0.01, fused_lrelu)
  (``:83-89``);
- codebook lookup replaces the reference's per-sample python loop
  (``SelectText``, ``:200-215``) with a batched ``take`` — the TPU-native
  equivalent.

All tensors NHWC.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from marconet_tpu.models.encoder import scaled_width
from marconet_tpu.ops.layers import EqualLinear, PixelNorm
from marconet_tpu.ops.modconv import StyledConv, ToRGB

Dtype = Any

# channel plan per resolution (channel_multiplier=1)
_CHANNELS = {4: 512, 8: 512, 16: 512, 32: 512, 64: 256, 128: 128}


class PriorOutput(NamedTuple):
    image: jax.Array    # (B, 128, 128*c, 3) tanh'd RGB
    feat64: jax.Array   # (B, 64, 64*c, 256)
    feat32: jax.Array   # (B, 32, 32*c, 512)
    rgb64: jax.Array    # (B, 64, 64*c, 3)
    rgb32: jax.Array    # (B, 32, 32*c, 3)


class StyleMLP(nn.Module):
    """PixelNorm + 8 equalized linears with fused LeakyReLU."""

    style_dim: int = 512
    n_layers: int = 8
    lr_mul: float = 0.01
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        x = PixelNorm()(z)
        for i in range(self.n_layers):
            x = EqualLinear(self.style_dim, lr_mul=self.lr_mul,
                            activation="fused_lrelu", dtype=self.dtype,
                            name=f"fc{i}")(x)
        return x


class CharCodebook(nn.Module):
    """Per-character learned 4x4 constant inputs.

    A (num_classes, channels) embedding table; a batch of label sequences
    (B, c) maps to a (B, 4, 4*c, channels) canvas by broadcasting each
    embedding over its 4x4 cell and concatenating cells along width —
    the static-shape equivalent of the reference's ``SelectText`` loop.
    """

    num_classes: int = 6736
    features: int = 512
    size: int = 4

    @nn.compact
    def __call__(self, labels):
        emb = self.param(
            "embeddings",
            lambda key, shape: jax.random.normal(key, shape),
            (self.num_classes, self.features),
        )
        vecs = jnp.take(emb, labels, axis=0)  # (B, c, F)
        b, c, f = vecs.shape
        s = self.size
        # (B, c, F) -> (B, s, c*s, F)
        out = jnp.broadcast_to(vecs[:, None, :, None, :], (b, s, c, s, f))
        return out.reshape(b, s, c * s, f)


class StructurePriorGenerator(nn.Module):
    """The reference's ``TSPGAN`` (style MLP + codebook + conv pyramid)."""

    out_size: int = 128
    style_dim: int = 512
    num_classes: int = 6736
    n_mlp: int = 8
    width: float = 1.0
    dtype: Dtype = jnp.float32

    @property
    def channels(self):
        """Per-resolution channel plan, scaled by ``width`` (1.0 = exact)."""
        return {r: scaled_width(c, self.width, floor=16)
                for r, c in _CHANNELS.items()}

    @nn.compact
    def __call__(self, styles, labels, input_is_latent: bool = False):
        """styles: (B, 512); labels: (B,) or (B, c) int labels.

        Returns a ``PriorOutput``; for the canonical single-char batches
        (labels (B,)) the spatial shapes are 128/64/32 squares.
        """
        if labels.ndim == 1:
            labels = labels[:, None]
        w = styles if input_is_latent else StyleMLP(
            self.style_dim, self.n_mlp, dtype=self.dtype, name="style_mlp")(
                styles)
        # All 12 latent slots share one w at inference (reference
        # ``networks.py:141``); keep a single vector.
        chans = self.channels
        x = CharCodebook(self.num_classes, chans[4],
                         name="codebook")(labels)
        x = x.astype(self.dtype)

        x = StyledConv(chans[4], dtype=self.dtype, name="conv_4")(x, w)
        # the RGB skip chain runs channels-major (B, 3, H, W): at 3/128
        # lane fill the NHWC chain's per-resolution tanh/add/upsample
        # steps are the generator's measured elementwise hot spot
        # (BENCH_NOTES.md); one cheap transpose per returned image
        # restores the NHWC contract
        skip = ToRGB(upsample=False, channels_major=True, dtype=self.dtype,
                     name="to_rgb_4")(x, w)

        def nhwc(rgb_cm):
            return jnp.transpose(rgb_cm, (0, 2, 3, 1))

        feat64 = feat32 = rgb64 = rgb32 = None
        res = 4
        while res < self.out_size:
            res *= 2
            ch = chans[res]
            x = StyledConv(ch, upsample=True, dtype=self.dtype,
                           name=f"conv_{res}_up")(x, w)
            x = StyledConv(ch, dtype=self.dtype, name=f"conv_{res}")(x, w)
            skip = ToRGB(channels_major=True, dtype=self.dtype,
                         name=f"to_rgb_{res}")(x, w, skip)
            if res == 32:
                feat32, rgb32 = x, nhwc(skip)
            if res == 64:
                feat64, rgb64 = x, nhwc(skip)
        return PriorOutput(nhwc(skip), feat64, feat32, rgb64, rgb32)
