"""Legacy transformer OCR (pre-2025-06 recognition path).

JAX re-implementation of the reference's ``models/ocr.py:310-370``
(``TransformerOCR``): a BN ResNet-34-style conv encoder (maxpool
downsampling, ``:39-126``), a single-block autoregressive decoder at
d=1024 formed by concatenating a 512-d character embedding with a 512-d
sinusoidal positional encoding (``:281-308,325-343``), and a vocab
projection head (vocab 6738). The reference keeps this for the
``net_real_world_ocr.pth``/``net_new_bbox.pth`` checkpoints (now disabled
in ``checkpoints/download_github.py:6-7``) — carried here for checkpoint
compatibility, with a greedy ``lax.scan`` decode loop replacing the
per-step python loop.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from marconet_tpu.ops.layers import Conv

Dtype = Any


class BNBlock(nn.Module):
    """conv-bn-relu-conv-bn residual block (reference ``ocr.py:9-36``)."""

    features: int
    project: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        def bn(name):
            return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                                momentum=0.9, dtype=self.dtype, name=name)

        y = Conv(self.features, dtype=self.dtype, name="conv1")(x)
        y = jax.nn.relu(bn("bn1")(y))
        y = Conv(self.features, dtype=self.dtype, name="conv2")(y)
        y = bn("bn2")(y)
        if self.project:
            x = Conv(self.features, dtype=self.dtype, name="down_conv")(x)
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                             momentum=0.9, dtype=self.dtype,
                             name="down_bn")(x)
        return jax.nn.relu(y + x)


class OCREncoder(nn.Module):
    """Maxpool-downsampling BN ResNet (layers [3,4,6,3], 3->1024ch)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        def bn(name):
            return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                                momentum=0.9, dtype=self.dtype, name=name)

        def pool(t):
            return nn.max_pool(t, (2, 2), strides=(2, 2))

        x = jax.nn.relu(bn("bn1")(Conv(64, dtype=self.dtype,
                                       name="conv1")(x)))
        x = pool(x)
        x = jax.nn.relu(bn("bn2")(Conv(128, dtype=self.dtype,
                                       name="conv2")(x)))
        plan = ((256, 3), (256, 4), (512, 6), (512, 3))
        in_ch = 128
        for li, (ch, blocks) in enumerate(plan, start=1):
            if li < 4:
                x = pool(x)
            for bi in range(blocks):
                x = BNBlock(ch, project=(bi == 0 and in_ch != ch),
                            dtype=self.dtype,
                            name=f"layer{li}_{bi}")(x)
            in_ch = ch
            if li < 4:
                x = jax.nn.relu(bn(f"layer{li}_bn")(
                    Conv(ch, dtype=self.dtype, name=f"layer{li}_conv")(x)))
        x = jax.nn.relu(bn("out_bn")(Conv(1024, dtype=self.dtype,
                                          name="out_conv")(x)))
        return x


def sinusoidal_pe(length: int, d_model: int) -> np.ndarray:
    pos = np.arange(length)[:, None].astype(np.float64)
    div = np.exp(np.arange(0, d_model, 2) * -(math.log(10000.0) / d_model))
    pe = np.zeros((length, d_model), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


class MHA(nn.Module):
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, mask=None):
        d = q.shape[-1]
        dk = d // self.heads

        def proj(name, t):
            return nn.Dense(d, dtype=self.dtype, name=name)(t).reshape(
                t.shape[0], t.shape[1], self.heads, dk).transpose(0, 2, 1, 3)

        qh, kh, vh = proj("q", q), proj("k", k), proj("v", v)
        scores = jnp.einsum("bhid,bhjd->bhij", qh, kh) / math.sqrt(dk)
        if mask is not None:
            scores = jnp.where(mask, scores, -jnp.inf)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(q.shape[0], q.shape[1], d)
        return nn.Dense(d, dtype=self.dtype, name="out")(out)


class AddNorm(nn.Module):
    """The reference's hand-rolled LayerNorm: std (unbiased) + eps OUTSIDE
    the sqrt (``ocr.py:211-222``)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        a = self.param("scale", nn.initializers.ones, (d,))
        b = self.param("bias", nn.initializers.zeros, (d,))
        mean = x.mean(-1, keepdims=True)
        std = jnp.sqrt(
            jnp.square(x - mean).sum(-1, keepdims=True) / (d - 1))
        return a * (x - mean) / (std + self.eps) + b


class OCRDecoderBlock(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, text, memory):
        n = text.shape[1]
        causal = jnp.tril(jnp.ones((1, 1, n, n), bool))
        x = AddNorm(name="norm1")(
            text + MHA(4, dtype=self.dtype, name="self_attn")(
                text, text, text, mask=causal))
        x = AddNorm(name="norm2")(
            x + MHA(4, dtype=self.dtype, name="cross_attn")(
                x, memory, memory))
        h = nn.Dense(2048, dtype=self.dtype, name="ff1")(x)
        h = nn.Dense(1024, dtype=self.dtype, name="ff2")(jax.nn.relu(h))
        return AddNorm(name="norm3")(x + h)


class LegacyTransformerOCR(nn.Module):
    """Autoregressive text recognizer (vocab 6738: alphabet + blank +
    start/end token).

    ``use_loc_head=True`` adds the per-token box head of the
    ``net_new_bbox.pth`` variant (reference ``ocr.py:318-320``:
    ``Generator(1024, 1, norm=True)`` = relu(linear)); the logits-only
    layout matches ``net_real_world_ocr.pth``. Checkpoints load via
    ``marconet_tpu.convert.ocr_import.convert_legacy_ocr``.
    """

    vocab: int = 6738
    use_loc_head: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image, text_input):
        """image: (B, H, W, 3) NHWC; text_input: (B, T) int tokens.
        Returns per-position vocab logits (B, T, vocab) — plus per-token
        locs (B, T, 1) when ``use_loc_head``."""
        memory = OCREncoder(dtype=self.dtype, name="encoder")(image)
        b, h, w, c = memory.shape
        memory = memory.reshape(b, h * w, c)

        emb = nn.Embed(self.vocab, 512, dtype=self.dtype,
                       name="embedding")(text_input) * math.sqrt(512.0)
        pe = jnp.asarray(sinusoidal_pe(text_input.shape[1], 512),
                         self.dtype)
        x = jnp.concatenate(
            [emb, jnp.broadcast_to(pe, emb.shape)], axis=-1)  # d=1024
        x = OCRDecoderBlock(dtype=self.dtype, name="decoder")(x, memory)
        logits = nn.Dense(self.vocab, dtype=self.dtype,
                          name="generator")(x)
        if self.use_loc_head:
            locs = jax.nn.relu(
                nn.Dense(1, dtype=self.dtype, name="loc_head")(x))
            return logits, locs
        return logits

    def greedy_decode(self, variables, image, max_len: int = 32,
                      start_token: int = 0):
        """Greedy autoregressive decoding with a static-length loop."""
        b = image.shape[0]
        tokens = jnp.full((b, max_len + 1), start_token, jnp.int32)

        def body(i, toks):
            out = self.apply(variables, image, toks[:, :-1])
            logits = out[0] if isinstance(out, tuple) else out
            nxt = jnp.argmax(logits[:, i], axis=-1).astype(jnp.int32)
            return toks.at[:, i + 1].set(nxt)

        tokens = jax.lax.fori_loop(0, max_len, body, tokens)
        return tokens[:, 1:]
