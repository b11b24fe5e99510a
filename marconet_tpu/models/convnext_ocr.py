"""ConvNeXt + ViT CTC line recognizer (ModelScope ``ConvNextViT``).

The reference recognizes masked character segments with ModelScope's
``damo/cv_convnextTiny_ocr-recognition-general_damo`` pipeline
(``test_sr.py:56``, consumed at ``utils/yolo_ocr_xloc.py:90-98``). That
model is a ConvNeXt trunk feeding a ViT encoder with a per-frame CTC
head over its own vocabulary (``vocab.txt`` in the model dir) — NOT the
MARCONet alphabet; the reference maps recognized characters onto alphabet
indices afterwards (``test_sr.py:149-165``).

This is the TPU-native implementation. Exact topology (stage depths/dims,
ViT width/depth, vocab size, token count) is *derived from the exported
checkpoint* by ``marconet_tpu.convert.ocr_import.load_ocr_checkpoint``,
which returns a matching ``OCRConfig`` — so the compiled graph always
matches the weights. The class defaults below are the documented
reconstruction for weight-free use (trainable recognizer over any
charset).

OCR-specific geometry: the trunk keeps width resolution high (stem
stride 4, then height-only stride-(2,1) stage transitions) so a
(32, W) line maps to W/4 frames of CTC logits with height fully
collapsed — the standard CTC-recognizer adaptation of a classification
trunk, and the only geometry consistent with the ModelScope model's
sequence output on 32-high inputs.

Export path (zero-egress environments): run ``tools/export_ocr_sd.py``
on a machine with ``modelscope`` installed to produce
``ocr_convnext_sd.pth`` + ``ocr_vocab.txt`` + a key manifest; drop them
in the checkpoint dir.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from marconet_tpu.alphabet import ALPHABET

Dtype = Any


@dataclass(frozen=True)
class OCRConfig:
    """Topology of the ConvNextViT recognizer.

    Defaults reconstruct the ModelScope ConvNeXt-Tiny OCR; when a real
    checkpoint is loaded every field is overridden by the state dict's
    actual shapes (``convert.ocr_import``).
    """

    depths: Tuple[int, ...] = (3, 3, 9, 3)
    dims: Tuple[int, ...] = (96, 192, 384, 768)
    vit_depth: int = 12
    vit_dim: int = 768
    vit_heads: int = 12
    vit_mlp_ratio: float = 4.0
    num_classes: int = len(ALPHABET) + 1   # +1 CTC blank
    blank_index: int = 0                   # ModelScope CTC blank is id 0
    use_cls_token: bool = False
    # explicit CNN->ViT projection even when dims match (present in some
    # checkpoints as patch_embed.proj); None = auto (project iff dims
    # differ)
    use_vit_proj: Optional[bool] = None
    cnn_final_norm: bool = False           # trailing LN on the trunk
    layer_scale_init: float = 1e-6
    # canonical ViT sequence length (incl. cls token), from the loaded
    # checkpoint's pos_embed. When set, ``pos_embed`` is ALWAYS declared
    # at this length and linearly interpolated to the input's token count
    # — so a fixed-length checkpoint works at any segment width (the
    # reference's ModelScope pipeline accepts arbitrary widths,
    # ``utils/yolo_ocr_xloc.py:90``). None = declare by input shape
    # (weight-free/trainable use).
    seq_len: Optional[int] = None

    @property
    def canonical_width(self) -> Optional[int]:
        """Input width whose token count matches ``seq_len`` exactly
        (stem stride 4: W/4 frames + optional cls token)."""
        if self.seq_len is None:
            return None
        return 4 * (self.seq_len - (1 if self.use_cls_token else 0))


class ConvNeXtBlock(nn.Module):
    """7x7 depthwise -> LN -> pw MLP (GELU) with layer scale."""

    dim: int
    layer_scale_init: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x
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
        if self.layer_scale_init > 0:
            gamma = self.param(
                "gamma", nn.initializers.constant(self.layer_scale_init),
                (self.dim,))
            x = gamma.astype(x.dtype) * x
        return inp + x


class ConvNeXtTrunk(nn.Module):
    """ConvNeXt trunk with OCR geometry: stem stride 4, then height-only
    (2, 1) downsampling between stages — width resolution is preserved so
    the frame rate stays W/4."""

    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    layer_scale_init: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), padding="VALID",
                    dtype=self.dtype, name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         name="stem_norm")(x)
        for si, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if si > 0:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"down_norm{si}")(x)
                x = nn.Conv(dim, (2, 1), strides=(2, 1), padding="VALID",
                            dtype=self.dtype, name=f"down_conv{si}")(x)
            for bi in range(depth):
                x = ConvNeXtBlock(dim,
                                  layer_scale_init=self.layer_scale_init,
                                  dtype=self.dtype,
                                  name=f"stage{si}_{bi}")(x)
        return x  # (B, 32/32=1, W/4, dims[-1])


def resize_pos_embed(pos, n_tokens: int, use_cls_token: bool):
    """Linearly interpolate a (1, L, D) positional embedding to
    ``n_tokens`` entries, keeping the cls slot (if any) uninterpolated —
    the standard ViT variable-resolution adaptation. Identity when the
    lengths already match."""
    if pos.shape[1] == n_tokens:
        return pos
    cls_part = None
    if use_cls_token:
        cls_part, pos = pos[:, :1], pos[:, 1:]
        n_tokens -= 1
    pos = jax.image.resize(pos, (1, n_tokens, pos.shape[-1]),
                           method="linear")
    if cls_part is not None:
        pos = jnp.concatenate([cls_part, pos], axis=1)
    return pos


class ViTBlock(nn.Module):
    """Standard pre-norm ViT encoder block (timm convention: qkv fused,
    biases on q/k/v and proj — matches the ViTSTR/DeiT weights)."""

    heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, d = x.shape
        h = self.heads
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(y)
        q, k, v = jnp.split(qkv.reshape(b, n, 3, h, d // h)
                            .transpose(2, 0, 3, 1, 4), 3, axis=0)
        q, k, v = q[0], k[0], v[0]
        attn = jax.nn.softmax(
            jnp.einsum("bhid,bhjd->bhij", q, k,
                       preferred_element_type=jnp.float32)
            * ((d // h) ** -0.5), axis=-1).astype(v.dtype)
        y = jnp.einsum("bhij,bhjd->bhid", attn, v)
        y = y.transpose(0, 2, 1, 3).reshape(b, n, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="proj")(y)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(d * self.mlp_ratio), dtype=self.dtype,
                     name="mlp1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(d, dtype=self.dtype, name="mlp2")(y)
        return x + y


class ConvNextViT(nn.Module):
    """ConvNeXt trunk -> frame sequence -> ViT encoder -> CTC logits.

    Input (B, 32, W, 3) in [-1, 1] (i.e. ``(x/255 - 0.5) / 0.5``, the
    normalization ``CharacterFrontend.recognize_segment`` applies and
    ``tools/export_ocr_sd.py`` records in its manifest's ``__meta__``);
    output (B, W/4, num_classes).
    """

    config: OCRConfig = OCRConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        feat = ConvNeXtTrunk(depths=cfg.depths, dims=cfg.dims,
                             layer_scale_init=cfg.layer_scale_init,
                             dtype=self.dtype, name="cnn")(x)
        b, h, w, c = feat.shape
        seq = feat.mean(axis=1) if h > 1 else feat[:, 0]  # (B, W/4, C)
        if cfg.cnn_final_norm:
            seq = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                               name="cnn_norm")(seq)
        project = cfg.use_vit_proj if cfg.use_vit_proj is not None \
            else cfg.vit_dim != c
        if project:
            seq = nn.Dense(cfg.vit_dim, dtype=self.dtype,
                           name="vit_proj")(seq)
        n = seq.shape[1]
        if cfg.use_cls_token:
            cls = self.param("cls_token", nn.initializers.zeros,
                             (1, 1, cfg.vit_dim))
            seq = jnp.concatenate(
                [jnp.broadcast_to(cls.astype(seq.dtype),
                                  (b, 1, cfg.vit_dim)), seq], axis=1)
        pos_len = cfg.seq_len if cfg.seq_len is not None else seq.shape[1]
        pos = self.param("pos_embed",
                         nn.initializers.normal(0.02),
                         (1, pos_len, cfg.vit_dim))
        seq = seq + resize_pos_embed(pos.astype(seq.dtype), seq.shape[1],
                                     cfg.use_cls_token)
        for i in range(cfg.vit_depth):
            seq = ViTBlock(cfg.vit_heads, cfg.vit_mlp_ratio,
                           dtype=self.dtype, name=f"block{i}")(seq)
        seq = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(seq)
        if cfg.use_cls_token:
            seq = seq[:, 1:]
        return nn.Dense(cfg.num_classes, dtype=self.dtype,
                        name="head")(seq)


def ConvNeXtOCR(num_classes: int = len(ALPHABET) + 1,
                dtype: Dtype = jnp.float32, **cfg_kw) -> ConvNextViT:
    """Weight-free default recognizer over the MARCONet alphabet
    (blank last, like the core models' class 6735)."""
    return ConvNextViT(config=OCRConfig(num_classes=num_classes,
                                        blank_index=num_classes - 1,
                                        **cfg_kw), dtype=dtype)


def decode_ctc_ids(ids, charset: str = ALPHABET, blank: int = 0,
                   offset: int = 0) -> List[str]:
    """Greedy CTC decode of per-frame argmax ids (B, T) into strings.

    Split out of :func:`decode_ctc` so callers can take the argmax ON
    DEVICE and transfer (B, T) int32 instead of the full (B, T, C)
    logits — at the 6764-class recognizer that is a ~7000x smaller
    device-to-host transfer per call (BENCH_NOTES.md round-5 serve
    section).
    """
    out = []
    for seq in np.asarray(ids):
        chars, prev = [], -1
        for t in seq:
            ci = int(t) - offset
            if t != prev and t != blank and 0 <= ci < len(charset):
                chars.append(charset[ci])
            prev = t
        out.append("".join(chars))
    return out


def decode_ctc(logits, charset: str = ALPHABET,
               blank: Optional[int] = None,
               offset: int = 0) -> List[str]:
    """Greedy CTC decode of (B, T, C) logits into strings.

    ``offset``: first charset entry's class id (ModelScope vocabularies
    reserve low ids for blank/special tokens; the loader computes
    ``offset = num_classes - len(vocab)`` so id ``offset + i`` maps to
    ``vocab[i]``).
    """
    arr = np.asarray(logits)
    if blank is None:
        blank = arr.shape[-1] - 1 if offset == 0 else 0
    return decode_ctc_ids(arr.argmax(-1), charset=charset, blank=blank,
                          offset=offset)
