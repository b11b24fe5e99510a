"""YOLO11 character detector, JAX/flax.

The reference detects character boxes with ultralytics YOLO-11m
(``yolo11m_character.pt``; ``test_sr.py:55``, conf 0.07 / iou 0.1 /
imgsz 640 via ``utils/yolo_ocr_xloc.py:14-16,38``). This is a TPU-native
implementation of the published YOLO11 architecture (depth 0.50 / width
1.00 / max-channels 512 for the "m" scale): Conv-BN-SiLU stem,
C3k2 CSP stages, SPPF, C2PSA attention stage, FPN/PAN head and a
DFL-decoded anchor-free Detect head — with a static-shape top-k NMS
(``lax.top_k`` + IoU suppression matrix) instead of dynamic-shape NMS.

Weight import: ``marconet_tpu.convert.yolo_import`` maps an ultralytics
``.pt`` state dict onto this module tree.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

REG_MAX = 16


class ConvBNAct(nn.Module):
    """Conv + BatchNorm(eval) + SiLU (ultralytics ``Conv``)."""

    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        pad = k // 2
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, x.shape[-1] // self.groups, self.features))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups)
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         momentum=0.97, dtype=self.dtype, name="bn")(y)
        return jax.nn.silu(y) if self.act else y


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    e: float = 0.5
    k: Tuple[int, int] = (3, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_ = int(self.features * self.e)
        y = ConvBNAct(c_, self.k[0], dtype=self.dtype, name="cv1")(x)
        y = ConvBNAct(self.features, self.k[1], dtype=self.dtype,
                      name="cv2")(y)
        if self.shortcut and x.shape[-1] == self.features:
            y = y + x
        return y


class C3k(nn.Module):
    """CSP block with 3 convs (kernel-size-parameterized bottlenecks)."""

    features: int
    n: int = 1
    shortcut: bool = True
    k: int = 3
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_ = int(self.features * self.e)
        a = ConvBNAct(c_, 1, dtype=self.dtype, name="cv1")(x)
        b = ConvBNAct(c_, 1, dtype=self.dtype, name="cv2")(x)
        for i in range(self.n):
            a = Bottleneck(c_, self.shortcut, e=1.0, k=(self.k, self.k),
                           dtype=self.dtype, name=f"m{i}")(a)
        return ConvBNAct(self.features, 1, dtype=self.dtype, name="cv3")(
            jnp.concatenate([a, b], -1))


class C3k2(nn.Module):
    """YOLO11 CSP stage: split, n inner blocks (C3k or Bottleneck),
    concat-everything fuse."""

    features: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_ = int(self.features * self.e)
        y = ConvBNAct(2 * c_, 1, dtype=self.dtype, name="cv1")(x)
        parts = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            if self.c3k:
                parts.append(C3k(c_, 2, self.shortcut, dtype=self.dtype,
                                 name=f"m{i}")(parts[-1]))
            else:
                parts.append(Bottleneck(c_, self.shortcut, e=0.5,
                                        dtype=self.dtype,
                                        name=f"m{i}")(parts[-1]))
        return ConvBNAct(self.features, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(parts, -1))


class SPPF(nn.Module):
    features: int
    pool: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_ = x.shape[-1] // 2
        y = ConvBNAct(c_, 1, dtype=self.dtype, name="cv1")(x)
        p = self.pool
        outs = [y]
        for _ in range(3):
            outs.append(nn.max_pool(outs[-1], (p, p), strides=(1, 1),
                                    padding=((p // 2, p // 2),) * 2))
        return ConvBNAct(self.features, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(outs, -1))


class PSAAttention(nn.Module):
    """Position-sensitive attention (ultralytics ``Attention``)."""

    dim: int
    num_heads: int
    attn_ratio: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hd = c // self.num_heads
        kd = int(hd * self.attn_ratio)
        nh = self.num_heads
        total = nh * (kd * 2 + hd)
        qkv = ConvBNAct(total, 1, act=False, dtype=self.dtype,
                        name="qkv")(x)
        qkv = qkv.reshape(b, h * w, nh, kd * 2 + hd).transpose(0, 2, 1, 3)
        q, k, v = jnp.split(qkv, [kd, 2 * kd], axis=-1)
        attn = jnp.einsum("bhid,bhjd->bhij", q, k) * (kd ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
        vres = v.transpose(0, 2, 1, 3).reshape(b, h, w, c)
        out = out + ConvBNAct(c, 3, groups=c, act=False, dtype=self.dtype,
                              name="pe")(vres)
        return ConvBNAct(c, 1, act=False, dtype=self.dtype,
                         name="proj")(out)


class PSABlock(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x + PSAAttention(self.dim, num_heads=self.dim // 64,
                             dtype=self.dtype, name="attn")(x)
        y = ConvBNAct(self.dim * 2, 1, dtype=self.dtype, name="ffn1")(x)
        y = ConvBNAct(self.dim, 1, act=False, dtype=self.dtype,
                      name="ffn2")(y)
        return x + y


class C2PSA(nn.Module):
    features: int
    n: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_ = self.features // 2
        y = ConvBNAct(2 * c_, 1, dtype=self.dtype, name="cv1")(x)
        a, b = jnp.split(y, 2, axis=-1)
        for i in range(self.n):
            b = PSABlock(c_, dtype=self.dtype, name=f"m{i}")(b)
        return ConvBNAct(self.features, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([a, b], -1))


def _up2x_nearest(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class DetectHead(nn.Module):
    """Anchor-free detect head with DFL box decoding."""

    nc: int = 1
    ch: Sequence[int] = (256, 512, 512)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jax.Array]):
        c2 = max(16, self.ch[0] // 4, REG_MAX * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        box_out, cls_out = [], []
        for i, x in enumerate(feats):
            b = ConvBNAct(c2, 3, dtype=self.dtype, name=f"cv2_{i}_0")(x)
            b = ConvBNAct(c2, 3, dtype=self.dtype, name=f"cv2_{i}_1")(b)
            b = nn.Conv(4 * REG_MAX, (1, 1), dtype=self.dtype,
                        name=f"cv2_{i}_2")(b)
            c = ConvBNAct(x.shape[-1], 3, groups=x.shape[-1],
                          dtype=self.dtype, name=f"cv3_{i}_0_0")(x)
            c = ConvBNAct(c3, 1, dtype=self.dtype, name=f"cv3_{i}_0_1")(c)
            c = ConvBNAct(c3, 3, groups=c3, dtype=self.dtype,
                          name=f"cv3_{i}_1_0")(c)
            c = ConvBNAct(c3, 1, dtype=self.dtype, name=f"cv3_{i}_1_1")(c)
            c = nn.Conv(self.nc, (1, 1), dtype=self.dtype,
                        name=f"cv3_{i}_2")(c)
            box_out.append(b)
            cls_out.append(c)
        return box_out, cls_out


class YOLO11(nn.Module):
    """YOLO11 (scale m: depth 0.5, width 1.0, max_channels 512)."""

    nc: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) in [0,1], H/W multiples of 32.

        Returns (pred_boxes (B, A, 4) xyxy in px, pred_scores (B, A, nc)).
        """
        dt = self.dtype

        p1 = ConvBNAct(64, 3, 2, dtype=dt, name="b0")(x)
        p2 = ConvBNAct(128, 3, 2, dtype=dt, name="b1")(p1)
        x2 = C3k2(256, 1, c3k=False, e=0.25, dtype=dt, name="b2")(p2)
        p3 = ConvBNAct(256, 3, 2, dtype=dt, name="b3")(x2)
        x4 = C3k2(512, 1, c3k=False, e=0.25, dtype=dt, name="b4")(p3)
        p4 = ConvBNAct(512, 3, 2, dtype=dt, name="b5")(x4)
        x6 = C3k2(512, 1, c3k=True, dtype=dt, name="b6")(p4)
        p5 = ConvBNAct(512, 3, 2, dtype=dt, name="b7")(x6)
        x8 = C3k2(512, 1, c3k=True, dtype=dt, name="b8")(p5)
        x9 = SPPF(512, 5, dtype=dt, name="b9")(x8)
        x10 = C2PSA(512, 1, dtype=dt, name="b10")(x9)

        # FPN up path
        u1 = jnp.concatenate([_up2x_nearest(x10), x6], -1)
        x13 = C3k2(512, 1, c3k=False, shortcut=True, dtype=dt,
                   name="h13")(u1)
        u2 = jnp.concatenate([_up2x_nearest(x13), x4], -1)
        x16 = C3k2(256, 1, c3k=False, shortcut=True, dtype=dt,
                   name="h16")(u2)
        # PAN down path
        d1 = ConvBNAct(256, 3, 2, dtype=dt, name="h17")(x16)
        x19 = C3k2(512, 1, c3k=False, shortcut=True, dtype=dt, name="h19")(
            jnp.concatenate([d1, x13], -1))
        d2 = ConvBNAct(512, 3, 2, dtype=dt, name="h20")(x19)
        x22 = C3k2(512, 1, c3k=True, dtype=dt, name="h22")(
            jnp.concatenate([d2, x10], -1))

        feats = [x16, x19, x22]
        box_raw, cls_raw = DetectHead(self.nc, dtype=dt,
                                      name="detect")(feats)
        return decode_dfl(box_raw, cls_raw, (8, 16, 32), self.nc)


def decode_dfl(box_raw: List[jax.Array], cls_raw: List[jax.Array],
               strides: Sequence[int], nc: int):
    """Ultralytics Detect decode: DFL expectation + dist2bbox.

    Per level: (B, H, W, 4*REG_MAX) raw box logits -> softmax over the 16
    bins -> expected distance -> xyxy around the (x+0.5, y+0.5) anchor
    grid, scaled by the level stride; class logits -> sigmoid. Matches
    ultralytics ``Detect._inference``/``DFL``/``dist2bbox``/
    ``make_anchors`` conventions (grid_cell_offset 0.5).
    """
    boxes, scores = [], []
    for stride, braw, craw in zip(strides, box_raw, cls_raw):
        b_, hh, ww, _ = braw.shape
        dist = braw.reshape(b_, hh * ww, 4, REG_MAX)
        dist = jax.nn.softmax(dist.astype(jnp.float32), axis=-1)
        dist = (dist * jnp.arange(REG_MAX, dtype=jnp.float32)).sum(-1)
        cy, cx = jnp.meshgrid(jnp.arange(hh) + 0.5,
                              jnp.arange(ww) + 0.5, indexing="ij")
        anchors = jnp.stack([cx.reshape(-1), cy.reshape(-1)], -1)
        lt, rb = dist[..., :2], dist[..., 2:]
        x1y1 = (anchors[None] - lt) * stride
        x2y2 = (anchors[None] + rb) * stride
        boxes.append(jnp.concatenate([x1y1, x2y2], -1))
        scores.append(jax.nn.sigmoid(
            craw.reshape(b_, hh * ww, nc).astype(jnp.float32)))
    return jnp.concatenate(boxes, 1), jnp.concatenate(scores, 1)


def nms_static(boxes, scores, max_det: int = 100, iou_thresh: float = 0.1,
               conf_thresh: float = 0.07):
    """Static-shape class-agnostic NMS.

    boxes: (A, 4) xyxy; scores: (A,). Returns (boxes (max_det, 4),
    scores (max_det,), valid (max_det,)) — suppressed/low-conf slots have
    valid=0. Equivalent to ultralytics NMS at the reference's thresholds
    (conf 0.07, iou 0.1) but with a fixed candidate budget, jit-friendly.
    """
    scores = jnp.where(scores >= conf_thresh, scores, -1.0)
    top_scores, idx = jax.lax.top_k(scores, max_det)
    top_boxes = boxes[idx]

    x1, y1, x2, y2 = [top_boxes[:, i] for i in range(4)]
    area = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(xx2 - xx1, 0) * jnp.maximum(yy2 - yy1, 0)
    union = area[:, None] + area[None, :] - inter
    iou = inter / jnp.maximum(union, 1e-9)

    # greedy suppression in score order via a sequential scan
    def body(keep, i):
        # suppressed if any higher-scoring kept box overlaps > threshold
        overlap = (iou[i] > iou_thresh) & keep & \
            (jnp.arange(keep.shape[0]) < i)
        ki = (top_scores[i] > 0) & ~overlap.any()
        return keep.at[i].set(ki), None

    keep0 = jnp.zeros(max_det, bool)
    keep, _ = jax.lax.scan(body, keep0, jnp.arange(max_det))
    return top_boxes, jnp.where(keep, top_scores, 0.0), keep.astype(
        jnp.float32)
