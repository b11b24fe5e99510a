"""ConvNeXt-Tiny CTC text recognizer.

The reference recognizes the masked character segments with ModelScope's
``damo/cv_convnextTiny_ocr-recognition-general_damo`` pipeline
(``test_sr.py:56``). This is a TPU-native ConvNeXt-Tiny line recognizer:
standard ConvNeXt-T trunk (depths 3/3/9/3, dims 96/192/384/768,
LayerNorm + 7x7 depthwise + pointwise MLP blocks with layer-scale),
height-pooled into a frame sequence and projected to per-frame CTC
logits. ``decode_ctc`` collapses repeats/blank.

Weights: ``marconet_tpu.convert.ocr_import`` maps the ModelScope
checkpoint when available; otherwise the class works as a trainable
recognizer with any vocabulary (default: the 6736-class alphabet).
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from marconet_tpu.alphabet import ALPHABET

Dtype = Any


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x
        # 7x7 depthwise
        kernel = self.param("dw_kernel", nn.initializers.lecun_normal(),
                            (7, 7, 1, self.dim))
        x = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(1, 1), padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.dim)
        x = x + self.param("dw_bias", nn.initializers.zeros,
                           (self.dim,)).astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, name="pw1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pw2")(x)
        gamma = self.param("gamma",
                           nn.initializers.constant(self.layer_scale_init),
                           (self.dim,))
        return inp + gamma.astype(x.dtype) * x


class ConvNeXtTiny(nn.Module):
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # stem: 4x4 stride-4 conv + LN
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), padding="VALID",
                    dtype=self.dtype, name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)
        for si, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if si > 0:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"down_norm{si}")(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name=f"down_conv{si}")(x)
            for bi in range(depth):
                x = ConvNeXtBlock(dim, dtype=self.dtype,
                                  name=f"stage{si}_{bi}")(x)
        return x


class ConvNeXtOCR(nn.Module):
    """Line recognizer: ConvNeXt-T trunk -> frame sequence -> CTC logits."""

    num_classes: int = len(ALPHABET) + 1  # + blank
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, 32, W, 3) in [0,1]. Returns (B, W/8, num_classes)."""
        feat = ConvNeXtTiny(dtype=self.dtype, name="trunk")(x)
        # (B, 32/32=1..2, W/32, 768): collapse height, widen sequence x4
        b, h, w, c = feat.shape
        seq = feat.mean(axis=1)  # (B, W/32, C)
        seq = nn.Dense(4 * c, dtype=self.dtype, name="expand")(seq)
        seq = seq.reshape(b, w * 4, c)  # frame rate x4 => W/8 frames
        seq = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                           name="head_norm")(seq)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name="head")(seq)


def decode_ctc(logits, charset: str = ALPHABET,
               blank: int | None = None) -> List[str]:
    """Greedy CTC decode of (B, T, C) logits into strings."""
    arr = np.asarray(logits)
    blank = arr.shape[-1] - 1 if blank is None else blank
    out = []
    for seq in arr.argmax(-1):
        chars, prev = [], -1
        for t in seq:
            if t != prev and t != blank and t < len(charset):
                chars.append(charset[t])
            prev = t
        out.append("".join(chars))
    return out
