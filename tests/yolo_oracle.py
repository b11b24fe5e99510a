"""Functional torch re-statement of the FULL YOLO11 graph.

Consumes an ultralytics-layout state dict (``tests.yolo_spec``) directly
and computes the whole forward — backbone -> FPN/PAN neck -> Detect head
-> DFL decode — with torch ops, mirroring the ultralytics module
semantics (``Conv``=conv+BN(eps 1e-3)+SiLU, ``C3k2``/``C3k``/
``Bottleneck`` CSP blocks, ``SPPF``, ``C2PSA`` position-sensitive
attention, nearest 2x upsample, anchor grid offset 0.5). The block-level
oracles in test_frontend pin per-op numerics; this pins the *wiring*:
topology, stride geometry and decode conventions of
``marconet_tpu.models.yolo.YOLO11`` (reference usage: ``test_sr.py:55``,
``utils/yolo_ocr_xloc.py:14-41``).
"""

from typing import Dict, List

import numpy as np
import torch
import torch.nn.functional as F

REG_MAX = 16


def _t(sd, key):
    return torch.from_numpy(np.asarray(sd[key], np.float32))


def conv_bn(sd, prefix, x, stride=1, groups=1, act=True):
    w = _t(sd, f"{prefix}.conv.weight")
    k = w.shape[-1]
    y = F.conv2d(x, w, stride=stride, padding=k // 2, groups=groups)
    y = F.batch_norm(y, _t(sd, f"{prefix}.bn.running_mean"),
                     _t(sd, f"{prefix}.bn.running_var"),
                     _t(sd, f"{prefix}.bn.weight"),
                     _t(sd, f"{prefix}.bn.bias"), training=False, eps=1e-3)
    return F.silu(y) if act else y


def bottleneck(sd, prefix, x, shortcut=True):
    y = conv_bn(sd, f"{prefix}.cv1", x)
    y = conv_bn(sd, f"{prefix}.cv2", y)
    if shortcut and x.shape[1] == y.shape[1]:
        y = y + x
    return y


def c3k(sd, prefix, x, n=2):
    a = conv_bn(sd, f"{prefix}.cv1", x)
    b = conv_bn(sd, f"{prefix}.cv2", x)
    for i in range(n):
        a = bottleneck(sd, f"{prefix}.m.{i}", a)
    return conv_bn(sd, f"{prefix}.cv3", torch.cat([a, b], 1))


def c3k2(sd, prefix, x, use_c3k, n=1):
    y = conv_bn(sd, f"{prefix}.cv1", x)
    parts = list(y.chunk(2, 1))
    for i in range(n):
        if use_c3k:
            parts.append(c3k(sd, f"{prefix}.m.{i}", parts[-1]))
        else:
            parts.append(bottleneck(sd, f"{prefix}.m.{i}", parts[-1]))
    return conv_bn(sd, f"{prefix}.cv2", torch.cat(parts, 1))


def sppf(sd, prefix, x):
    y = conv_bn(sd, f"{prefix}.cv1", x)
    outs = [y]
    for _ in range(3):
        outs.append(F.max_pool2d(outs[-1], 5, stride=1, padding=2))
    return conv_bn(sd, f"{prefix}.cv2", torch.cat(outs, 1))


def psa_attention(sd, prefix, x, num_heads):
    b, c, h, w = x.shape
    hd = c // num_heads
    kd = int(hd * 0.5)
    n = h * w
    qkv = conv_bn(sd, f"{prefix}.qkv", x, act=False)
    q, k, v = qkv.view(b, num_heads, kd * 2 + hd, n).split(
        [kd, kd, hd], dim=2)
    attn = (q.transpose(-2, -1) @ k) * (kd ** -0.5)
    attn = attn.softmax(dim=-1)
    out = (v @ attn.transpose(-2, -1)).view(b, c, h, w)
    out = out + conv_bn(sd, f"{prefix}.pe", v.reshape(b, c, h, w),
                        groups=c, act=False)
    return conv_bn(sd, f"{prefix}.proj", out, act=False)


def c2psa(sd, prefix, x, n=1):
    y = conv_bn(sd, f"{prefix}.cv1", x)
    a, b = y.chunk(2, 1)
    c_ = a.shape[1]
    for i in range(n):
        mp = f"{prefix}.m.{i}"
        b = b + psa_attention(sd, f"{mp}.attn", b, num_heads=c_ // 64)
        ff = conv_bn(sd, f"{mp}.ffn.0", b)
        b = b + conv_bn(sd, f"{mp}.ffn.1", ff, act=False)
    return conv_bn(sd, f"{prefix}.cv2", torch.cat([a, b], 1))


def detect_decode(sd, feats: List[torch.Tensor], nc=1, detect_idx=23):
    boxes, scores = [], []
    strides = (8, 16, 32)
    for i, (x, stride) in enumerate(zip(feats, strides)):
        p = f"model.{detect_idx}"
        br = conv_bn(sd, f"{p}.cv2.{i}.0", x)
        br = conv_bn(sd, f"{p}.cv2.{i}.1", br)
        br = F.conv2d(br, _t(sd, f"{p}.cv2.{i}.2.weight"),
                      _t(sd, f"{p}.cv2.{i}.2.bias"))
        cr = conv_bn(sd, f"{p}.cv3.{i}.0.0", x, groups=x.shape[1])
        cr = conv_bn(sd, f"{p}.cv3.{i}.0.1", cr)
        cr = conv_bn(sd, f"{p}.cv3.{i}.1.0", cr, groups=cr.shape[1])
        cr = conv_bn(sd, f"{p}.cv3.{i}.1.1", cr)
        cr = F.conv2d(cr, _t(sd, f"{p}.cv3.{i}.2.weight"),
                      _t(sd, f"{p}.cv3.{i}.2.bias"))
        b_, _, hh, ww = br.shape
        # (B, 4*REG, H, W) -> (B, H*W, 4, REG): channel axis is
        # (4, REG)-major like the ultralytics DFL view
        dist = br.permute(0, 2, 3, 1).reshape(b_, hh * ww, 4, REG_MAX)
        dist = torch.softmax(dist, dim=-1) @ torch.arange(
            REG_MAX, dtype=torch.float32)
        cy, cx = torch.meshgrid(torch.arange(hh) + 0.5,
                                torch.arange(ww) + 0.5, indexing="ij")
        anchors = torch.stack([cx.reshape(-1), cy.reshape(-1)], -1)
        lt, rb = dist[..., :2], dist[..., 2:]
        boxes.append(torch.cat([(anchors[None] - lt) * stride,
                                (anchors[None] + rb) * stride], -1))
        scores.append(torch.sigmoid(
            cr.permute(0, 2, 3, 1).reshape(b_, hh * ww, nc)))
    return torch.cat(boxes, 1), torch.cat(scores, 1)


def torch_yolo11_forward(sd: Dict[str, np.ndarray], x_nhwc: np.ndarray):
    """Full-graph forward. x_nhwc: (B, H, W, 3) float32 in [0, 1].
    Returns (boxes (B, A, 4), scores (B, A, nc)) as numpy."""
    with torch.no_grad():
        x = torch.from_numpy(x_nhwc).permute(0, 3, 1, 2).contiguous()
        p1 = conv_bn(sd, "model.0", x, stride=2)
        p2 = conv_bn(sd, "model.1", p1, stride=2)
        x2 = c3k2(sd, "model.2", p2, use_c3k=False)
        p3 = conv_bn(sd, "model.3", x2, stride=2)
        x4 = c3k2(sd, "model.4", p3, use_c3k=False)
        p4 = conv_bn(sd, "model.5", x4, stride=2)
        x6 = c3k2(sd, "model.6", p4, use_c3k=True)
        p5 = conv_bn(sd, "model.7", x6, stride=2)
        x8 = c3k2(sd, "model.8", p5, use_c3k=True)
        x9 = sppf(sd, "model.9", x8)
        x10 = c2psa(sd, "model.10", x9)

        u1 = torch.cat([F.interpolate(x10, scale_factor=2, mode="nearest"),
                        x6], 1)
        x13 = c3k2(sd, "model.13", u1, use_c3k=False)
        u2 = torch.cat([F.interpolate(x13, scale_factor=2, mode="nearest"),
                        x4], 1)
        x16 = c3k2(sd, "model.16", u2, use_c3k=False)
        d1 = conv_bn(sd, "model.17", x16, stride=2)
        x19 = c3k2(sd, "model.19", torch.cat([d1, x13], 1), use_c3k=False)
        d2 = conv_bn(sd, "model.20", x19, stride=2)
        x22 = c3k2(sd, "model.22", torch.cat([d2, x10], 1), use_c3k=True)

        boxes, scores = detect_decode(sd, [x16, x19, x22])
        return boxes.numpy(), scores.numpy()


def fabricate_yolo_sd(rng: np.random.Generator) -> Dict[str, np.ndarray]:
    """Random-valued state dict on the exact ultralytics yolo11m key/shape
    spec, scaled to keep 30-layer activations O(1)."""
    from tests.yolo_spec import ultralytics_state_spec

    sd = {}
    for key, shape in ultralytics_state_spec().items():
        if key.endswith("running_var"):
            sd[key] = (0.5 + np.abs(rng.standard_normal(shape)) * 0.5
                       ).astype(np.float32)
        elif key.endswith(("bn.weight",)):
            sd[key] = (1.0 + rng.standard_normal(shape) * 0.1
                       ).astype(np.float32)
        elif key.endswith(("bn.bias", "running_mean", ".2.bias")):
            sd[key] = (rng.standard_normal(shape) * 0.1).astype(np.float32)
        else:  # conv kernels: lecun-ish fan-in scaling
            fan_in = int(np.prod(shape[1:]))
            sd[key] = (rng.standard_normal(shape) / np.sqrt(fan_in)
                       ).astype(np.float32)
    return sd
