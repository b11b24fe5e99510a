"""Text context encoder: ResNet-45 backbone + three-branch ViT head.

Predicts, from a low-quality text-line image, the per-token character
logits, per-character box (center, half-width) pairs and a 512-d font-style
vector ``w``.

Parity target: ``TextContextEncoderV2`` in reference ``models/networks.py:
27-45`` = resnet45 (``models/resnet.py:32-74``, height-only strides) +
``TextViT`` (``models/textvit_arch.py:12-77``). 43.06 M parameters total.

I/O (NHWC): (B, 32, 512, 3) -> logits (B, 64, 6736), locs (B, 32),
w (B, 512).
"""

from __future__ import annotations

import os
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from marconet_tpu.ops.layers import Conv
from marconet_tpu.ops.widthfold import wfold, wfold_conv, wunfold

Dtype = Any

MAX_CHARS = 16
NUM_TOKENS = 64


def scaled_width(value: int, width: float, floor: int = 8,
                 multiple: int = 1) -> int:
    """Channel count scaled by a width multiplier (width=1.0 is exact).

    Used to build structurally-identical reduced models for the multi-chip
    CPU dryrun and fast CI tiers — same code path, fewer channels.
    """
    v = int(round(value * width / multiple)) * multiple
    return max(floor, v)


# ---------------------------------------------------------------------------
# ResNet-45 backbone (height-only downsampling: 32 -> 8, width kept at 512)
# ---------------------------------------------------------------------------


class BasicBlock(nn.Module):
    """1x1 conv -> relu -> strided 3x3 conv, with 1x1 projection skip.

    With ``fold > 1`` the input/output are width-folded (``f*C``
    channels, see ``ops/widthfold``) and the convs run in the folded
    layout with trace-time-derived kernels — the parameter tree is
    identical to the plain path (the ``Conv`` modules own the hi-res
    kernels either way).
    """

    features: int
    strides: Tuple[int, int] = (1, 1)
    dtype: Dtype = jnp.float32
    fold: int = 1

    @nn.compact
    def __call__(self, x):
        f = self.fold
        in_features = x.shape[-1] // f
        conv1 = Conv(self.features, kernel_size=(1, 1), padding="VALID",
                     use_bias=False, dtype=self.dtype, name="conv1")
        conv2 = Conv(self.features, kernel_size=(3, 3), strides=self.strides,
                     padding=((1, 1), (1, 1)), use_bias=False,
                     dtype=self.dtype, name="conv2")
        down = None
        if self.strides != (1, 1) or in_features != self.features:
            down = Conv(self.features, kernel_size=(1, 1),
                        strides=self.strides, padding="VALID",
                        use_bias=False, dtype=self.dtype, name="downsample")
        if f == 1:
            y = jax.nn.relu(conv1(x))
            y = conv2(y)
            if down is not None:
                x = down(x)
            return jax.nn.relu(y + x)
        k1, _ = conv1(x[..., :in_features], kernels_only=True)
        y = jax.nn.relu(wfold_conv(x, k1.astype(self.dtype), f))
        k2, _ = conv2(y[..., :self.features], kernels_only=True)
        y = wfold_conv(y, k2.astype(self.dtype), f, strides=self.strides)
        if down is not None:
            kd, _ = down(x[..., :in_features], kernels_only=True)
            x = wfold_conv(x, kd.astype(self.dtype), f,
                           strides=self.strides)
        return jax.nn.relu(y + x)


class ResNet45(nn.Module):
    """Five-stage ResNet with (2,1) strides on stages 1 and 3.

    Stage plan (blocks, channels, stride): (3,32,(2,1)), (4,64,1),
    (6,128,(2,1)), (6,256,1), (3,512,1) — reference ``models/resnet.py:73-74``.

    ``fold > 1`` runs the low-channel leading stages in the width-folded
    layout (``ops/widthfold``): the stem and every stage whose folded
    channel count stays <= 512 compute with ``fold*C`` channels at
    ``W/fold`` columns — same parameters, MXU-shaped convs. The fold
    enters and leaves via free reshapes.
    """

    dtype: Dtype = jnp.float32
    stage_blocks: Sequence[int] = (3, 4, 6, 6, 3)
    stage_features: Sequence[int] = (32, 64, 128, 256, 512)
    stage_strides: Sequence[Tuple[int, int]] = (
        (2, 1), (1, 1), (2, 1), (1, 1), (1, 1))
    fold: int = 1

    @nn.compact
    def __call__(self, x):
        f = self.fold
        folded = f > 1
        conv1 = Conv(self.stage_features[0], kernel_size=(3, 3),
                     padding=((1, 1), (1, 1)),
                     use_bias=False, dtype=self.dtype, name="conv1")
        if folded:
            x = wfold(x, f)
            k, _ = conv1(x[..., :x.shape[-1] // f], kernels_only=True)
            x = jax.nn.relu(wfold_conv(x, k.astype(self.dtype), f))
        else:
            x = jax.nn.relu(conv1(x))
        for si, (blocks, feats, stride) in enumerate(zip(
                self.stage_blocks, self.stage_features, self.stage_strides)):
            if folded and feats * f > 256:
                x = wunfold(x, f)
                folded = False
            for bi in range(blocks):
                x = BasicBlock(feats,
                               strides=stride if bi == 0 else (1, 1),
                               dtype=self.dtype,
                               fold=f if folded else 1,
                               name=f"layer{si + 1}_{bi}")(x)
        if folded:
            x = wunfold(x, f)
        return x  # (B, 8, 512, 512)


# ---------------------------------------------------------------------------
# ViT head
# ---------------------------------------------------------------------------


def posemb_sincos_2d(h: int, w: int, dim: int, temperature: float = 10000.0):
    """2-D sin/cos positional embedding (reference ``textvit_arch.py:170-181``).

    Layout: concat(sin(x*om), cos(x*om), sin(y*om), cos(y*om)).
    """
    assert dim % 4 == 0
    y, x = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")
    omega = jnp.arange(dim // 4, dtype=jnp.float32) / (dim // 4 - 1)
    omega = 1.0 / (temperature ** omega)
    xo = x.reshape(-1)[:, None] * omega[None, :]
    yo = y.reshape(-1)[:, None] * omega[None, :]
    return jnp.concatenate(
        [jnp.sin(xo), jnp.cos(xo), jnp.sin(yo), jnp.cos(yo)], axis=1)


class Mlp(nn.Module):
    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(dim, dtype=self.dtype, name="fc2")(x)
        return x


class Attention(nn.Module):
    heads: int = 8
    dim_head: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, d = x.shape
        inner = self.heads * self.dim_head
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype,
                       name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, n, self.heads, self.dim_head).transpose(
                0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jax.nn.softmax(
            jnp.einsum("bhid,bhjd->bhij", q, k,
                       preferred_element_type=jnp.float32)
            * (self.dim_head ** -0.5), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_out")(
            out)


class EncoderBlock(nn.Module):
    """Pre-norm attention + MLP with residuals."""

    mlp_dim: int
    dim_head: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Attention(dim_head=self.dim_head, dtype=self.dtype,
                      name="attn")(x) + x
        x = Mlp(self.mlp_dim, dtype=self.dtype, name="ff")(x) + x
        return x


class SeqProject(nn.Module):
    """LayerNorm over the sequence axis + linear sequence-length projection.

    Implements the reference's ``linear_seq_maxlen`` / ``linear_w_maxlen``
    pattern (``textvit_arch.py:141-144,59-62``): permute to (B, D, N),
    LayerNorm(N), Linear(N -> out), permute back.
    """

    out_len: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, N, D)
        t = x.transpose(0, 2, 1)  # (B, D, N)
        t = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(t)
        t = nn.Dense(self.out_len, dtype=self.dtype, name="proj")(t)
        return t.transpose(0, 2, 1)  # (B, out_len, D)


class TextViTHead(nn.Module):
    """Shared trunk + three branch transformer head."""

    num_classes: int = 6736
    dim: int = 512
    mlp_dim: int = 1024
    dim_head: int = 64
    max_length: int = MAX_CHARS
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat):  # feat: (B, 8, 512, 512) NHWC
        b, h, w, c = feat.shape
        p = 8
        # patchify: (p1 p2 c) flatten order matches the reference einops
        # rearrange 'b c (h p1) (w p2) -> b h w (p1 p2 c)'
        x = feat.reshape(b, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (h // p) * (w // p),
                                                  p * p * c)
        x = nn.Dense(self.dim, dtype=self.dtype, name="patch_embed")(x)
        x = x + posemb_sincos_2d(h // p, w // p, self.dim).astype(x.dtype)

        for i in range(2):
            x = EncoderBlock(self.mlp_dim, dim_head=self.dim_head,
                             dtype=self.dtype, name=f"shared_{i}")(x)

        x_cls = EncoderBlock(self.mlp_dim, dim_head=self.dim_head,
                             dtype=self.dtype, name="branch_cls")(x)
        x16 = SeqProject(self.max_length, dtype=self.dtype,
                         name="seq_to_maxlen")(x)
        x_loc = EncoderBlock(self.mlp_dim // 2, dim_head=self.dim_head,
                             dtype=self.dtype, name="branch_locs")(x16)
        x_w = EncoderBlock(self.mlp_dim // 2, dim_head=self.dim_head,
                           dtype=self.dtype, name="branch_w")(x)

        # classification head: per-token logits
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          name="head_cls_proj")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="head_cls_norm")(x_cls))

        # locs head: (B, 16, 2) in (0,1) -> (B, 32)
        t = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="head_locs_norm")(x_loc)
        t = nn.Dense(self.dim // 2, dtype=self.dtype, name="head_locs_fc1")(t)
        t = jax.nn.gelu(t, approximate=False)
        t = nn.Dense(2, dtype=self.dtype, name="head_locs_fc2")(t)
        locs = jax.nn.sigmoid(t).reshape(b, -1)

        # w head: pool sequence 64 -> 1, then LN + Dense 512
        pooled = SeqProject(1, dtype=self.dtype, name="w_seq_pool")(x_w)
        wvec = nn.Dense(self.dim, dtype=self.dtype, name="head_w_proj")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="head_w_norm")(
                pooled.reshape(b, self.dim)))
        return logits, locs, wvec


def _enc_fold_default() -> int:
    """Width-fold factor for the encoder's low-channel ResNet stages.

    ``MARCONET_ENC_FOLD`` overrides; default 1 (plain): the round-4 chip
    A/B measured fold=2 at 114.71 and fold=4 at 114.59 vs the 114.5
    default — noise (BENCH_NOTES.md). The encoder's 56% MXU is not
    lane-padding-bound, so the fold stays an opt-in formulation.
    """
    return int(os.environ.get("MARCONET_ENC_FOLD", "1"))


class TextContextEncoder(nn.Module):
    """ResNet-45 + TextViT; the reference's ``TextContextEncoderV2``.

    ``width`` scales every channel dimension (1.0 = the exact reference
    architecture); reduced widths share the identical code path and are
    used by the multi-chip CPU dryrun and the fast CI tier.
    """

    num_classes: int = 6736
    width: float = 1.0
    # character-slot capacity (16 = the exact reference architecture;
    # reduced counts share the identical code path — dryrun/CI tiers)
    max_length: int = MAX_CHARS
    dtype: Dtype = jnp.float32

    @property
    def w_dim(self) -> int:
        """Dimension of the font-style vector ``w`` (512 at width 1)."""
        return scaled_width(512, self.width, floor=32, multiple=4)

    @nn.compact
    def __call__(self, lq):
        """lq: (B, 32, 512, 3) NHWC in [-1, 1]."""
        s = self.width
        feats = tuple(scaled_width(f, s)
                      for f in (32, 64, 128, 256, 512))
        dim = self.w_dim
        fold = _enc_fold_default()
        if lq.shape[2] % max(fold, 1):
            fold = 1
        feat = ResNet45(stage_features=feats, dtype=self.dtype,
                        fold=fold, name="resnet")(lq)
        return TextViTHead(num_classes=self.num_classes, dim=dim,
                           mlp_dim=2 * dim,
                           dim_head=scaled_width(64, s),
                           max_length=self.max_length,
                           dtype=self.dtype, name="vit")(feat)
