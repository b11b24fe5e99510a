"""Minimal PyTorch oracles used to cross-check JAX numerics in tests.

These are independent, test-only formulations of the mathematical ops (not
the reference modules): each oracle is written directly from the op's
definition so that agreement between the JAX implementation and the oracle
is meaningful evidence of correctness.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F


def fused_lrelu(x, bias, slope=0.2, scale=math.sqrt(2.0)):
    x = torch.from_numpy(x)
    b = torch.from_numpy(bias)
    y = F.leaky_relu(x + b.view(*([1] * (x.ndim - 1)), -1), slope) * scale
    return y.numpy()


def upsample2x_bilinear_nhwc(x):
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    y = F.interpolate(t, scale_factor=2, mode="bilinear", align_corners=False)
    return y.permute(0, 2, 3, 1).contiguous().numpy()


def equal_linear(x, kernel_io, bias, lr_mul=1.0, fused=False):
    """kernel_io: (in, out) JAX layout."""
    w = torch.from_numpy(kernel_io.T.copy())  # (out, in)
    scale = (1.0 / math.sqrt(kernel_io.shape[0])) * lr_mul
    y = F.linear(torch.from_numpy(x), w * scale)
    b = torch.from_numpy(bias) * lr_mul
    if fused:
        y = F.leaky_relu(y + b, 0.2) * math.sqrt(2.0)
    else:
        y = y + b
    return y.numpy()


def modulated_conv_grouped(x_nhwc, weight_hwio, style_bi, demodulate=True,
                           upsample=False):
    """Reference formulation: per-sample weights + grouped conv.

    Computes the *mathematical definition* of modulated conv — materialize
    W_b = scale * W * s_b (optionally demodulated) and convolve each sample
    with its own kernel — to validate the activation-folded TPU formulation.
    """
    b, h, w, ci = x_nhwc.shape
    kh, kw, _, co = weight_hwio.shape
    x = torch.from_numpy(x_nhwc).permute(0, 3, 1, 2)  # NCHW
    wt = torch.from_numpy(weight_hwio).permute(3, 2, 0, 1)  # OIHW
    s = torch.from_numpy(style_bi)  # (B, I)
    scale = 1.0 / math.sqrt(ci * kh * kw)
    wb = scale * wt.unsqueeze(0) * s.view(b, 1, ci, 1, 1)  # (B,O,I,kh,kw)
    if demodulate:
        demod = torch.rsqrt(wb.pow(2).sum([2, 3, 4]) + 1e-8)
        wb = wb * demod.view(b, co, 1, 1, 1)
    wb = wb.reshape(b * co, ci, kh, kw)
    if upsample:
        x = F.interpolate(x, scale_factor=2, mode="bilinear",
                          align_corners=False)
        h, w = 2 * h, 2 * w
    xg = x.reshape(1, b * ci, h, w)
    y = F.conv2d(xg, wb, padding=kh // 2, groups=b)
    y = y.reshape(b, co, h, w)
    return y.permute(0, 2, 3, 1).contiguous().numpy()


def group_norm_nhwc(x, gamma, beta, groups, eps=1e-6):
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    y = F.group_norm(t, groups, torch.from_numpy(gamma),
                     torch.from_numpy(beta), eps)
    return y.permute(0, 2, 3, 1).contiguous().numpy()


def adain_nhwc(prior, lq, eps=1e-5):
    """Unbiased-variance AdaIN, NCHW math, returns NHWC."""
    p = torch.from_numpy(prior).permute(0, 3, 1, 2)
    q = torch.from_numpy(lq).permute(0, 3, 1, 2)

    def stats(f):
        b, c = f.shape[:2]
        v = f.reshape(b, c, -1).var(dim=2) + eps
        return (f.reshape(b, c, -1).mean(dim=2).view(b, c, 1, 1),
                v.sqrt().view(b, c, 1, 1))

    qm, qs = stats(q)
    pm, ps = stats(p)
    out = (p - pm) / ps * qs + qm
    return out.permute(0, 2, 3, 1).contiguous().numpy()


def spectral_norm_conv(x_nhwc, kernel_hwio, bias, u, v, stride=1, padding=1):
    """Eval-mode spectral norm: sigma from stored u, v (no power iter)."""
    wt = torch.from_numpy(kernel_hwio).permute(3, 2, 0, 1)  # OIHW
    wmat = wt.reshape(wt.shape[0], -1)
    sigma = torch.dot(torch.from_numpy(u), wmat @ torch.from_numpy(v))
    x = torch.from_numpy(x_nhwc).permute(0, 3, 1, 2)
    y = F.conv2d(x, wt / sigma, torch.from_numpy(bias), stride=stride,
                 padding=padding)
    return y.permute(0, 2, 3, 1).contiguous().numpy()
