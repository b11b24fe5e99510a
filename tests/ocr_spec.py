"""Synthetic ModelScope ConvNextViT state-dict spec + torch oracle.

``modelscope_ocr_state_spec`` builds a small state dict in the exact key
layout ``convert.ocr_import.convert_modelscope_ocr`` expects from
``tools/export_ocr_sd.py`` (public ConvNeXt ``downsample_layers/stages``
keys + timm ViT ``blocks`` keys under a ``recognizer.`` prefix).

``torch_convnextvit_forward`` is a functional torch re-statement of the
same graph driven directly by those keys — the oracle that pins the JAX
model + converter to torch conv/LN/GELU/attention semantics.
"""

from typing import Dict, Tuple

import numpy as np
import torch
import torch.nn.functional as F

PREFIX = "recognizer."
DEPTHS = (1, 1, 2, 1)
DIMS = (8, 16, 24, 32)
VIT_DIM = 32
VIT_DEPTH = 2
NUM_CLASSES = 37


def modelscope_ocr_state_spec(rng: np.random.Generator
                              ) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}

    def t(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.2

    p = PREFIX
    sd[f"{p}downsample_layers.0.0.weight"] = t(DIMS[0], 3, 4, 4)
    sd[f"{p}downsample_layers.0.0.bias"] = t(DIMS[0])
    sd[f"{p}downsample_layers.0.1.weight"] = 1 + t(DIMS[0]) * 0.1
    sd[f"{p}downsample_layers.0.1.bias"] = t(DIMS[0])
    for i in range(1, 4):
        sd[f"{p}downsample_layers.{i}.0.weight"] = 1 + t(DIMS[i - 1]) * 0.1
        sd[f"{p}downsample_layers.{i}.0.bias"] = t(DIMS[i - 1])
        sd[f"{p}downsample_layers.{i}.1.weight"] = t(DIMS[i], DIMS[i - 1],
                                                     2, 1)
        sd[f"{p}downsample_layers.{i}.1.bias"] = t(DIMS[i])
    for s, (depth, dim) in enumerate(zip(DEPTHS, DIMS)):
        for b in range(depth):
            base = f"{p}stages.{s}.{b}"
            sd[f"{base}.dwconv.weight"] = t(dim, 1, 7, 7)
            sd[f"{base}.dwconv.bias"] = t(dim)
            sd[f"{base}.norm.weight"] = 1 + t(dim) * 0.1
            sd[f"{base}.norm.bias"] = t(dim)
            sd[f"{base}.pwconv1.weight"] = t(4 * dim, dim)
            sd[f"{base}.pwconv1.bias"] = t(4 * dim)
            sd[f"{base}.pwconv2.weight"] = t(dim, 4 * dim)
            sd[f"{base}.pwconv2.bias"] = t(dim)
            sd[f"{base}.gamma"] = np.full(dim, 0.5, np.float32)

    # ViT (timm convention), fed by the CNN through patch_embed.proj
    n_tokens = 17  # W=64 -> 16 frames + cls token
    sd[f"{p}cls_token"] = t(1, 1, VIT_DIM)
    sd[f"{p}pos_embed"] = t(1, n_tokens, VIT_DIM)
    sd[f"{p}patch_embed.proj.weight"] = t(VIT_DIM, DIMS[-1])
    sd[f"{p}patch_embed.proj.bias"] = t(VIT_DIM)
    for i in range(VIT_DEPTH):
        base = f"{p}blocks.{i}"
        sd[f"{base}.norm1.weight"] = 1 + t(VIT_DIM) * 0.1
        sd[f"{base}.norm1.bias"] = t(VIT_DIM)
        sd[f"{base}.attn.qkv.weight"] = t(3 * VIT_DIM, VIT_DIM)
        sd[f"{base}.attn.qkv.bias"] = t(3 * VIT_DIM)
        sd[f"{base}.attn.proj.weight"] = t(VIT_DIM, VIT_DIM)
        sd[f"{base}.attn.proj.bias"] = t(VIT_DIM)
        sd[f"{base}.norm2.weight"] = 1 + t(VIT_DIM) * 0.1
        sd[f"{base}.norm2.bias"] = t(VIT_DIM)
        sd[f"{base}.mlp.fc1.weight"] = t(4 * VIT_DIM, VIT_DIM)
        sd[f"{base}.mlp.fc1.bias"] = t(4 * VIT_DIM)
        sd[f"{base}.mlp.fc2.weight"] = t(VIT_DIM, 4 * VIT_DIM)
        sd[f"{base}.mlp.fc2.bias"] = t(VIT_DIM)
    sd[f"{p}norm.weight"] = 1 + t(VIT_DIM) * 0.1
    sd[f"{p}norm.bias"] = t(VIT_DIM)
    sd[f"{p}head.weight"] = t(NUM_CLASSES, VIT_DIM)
    sd[f"{p}head.bias"] = t(NUM_CLASSES)
    return sd


def torch_convnextvit_forward(sd: Dict[str, np.ndarray],
                              x_nhwc: np.ndarray) -> np.ndarray:
    """Functional torch forward over the spec keys; returns (B, T, C)."""
    g = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    p = PREFIX
    x = torch.from_numpy(x_nhwc).permute(0, 3, 1, 2)  # NCHW

    def ln_cl(t, w, b):  # LayerNorm over channels of NHWC-last tensor
        return F.layer_norm(t, (t.shape[-1],), w, b, eps=1e-6)

    x = F.conv2d(x, g[f"{p}downsample_layers.0.0.weight"],
                 g[f"{p}downsample_layers.0.0.bias"], stride=4)
    x = x.permute(0, 2, 3, 1)
    x = ln_cl(x, g[f"{p}downsample_layers.0.1.weight"],
              g[f"{p}downsample_layers.0.1.bias"])
    for s, depth in enumerate(DEPTHS):
        if s > 0:
            x = ln_cl(x, g[f"{p}downsample_layers.{s}.0.weight"],
                      g[f"{p}downsample_layers.{s}.0.bias"])
            x = F.conv2d(x.permute(0, 3, 1, 2),
                         g[f"{p}downsample_layers.{s}.1.weight"],
                         g[f"{p}downsample_layers.{s}.1.bias"],
                         stride=(2, 1)).permute(0, 2, 3, 1)
        for bi in range(depth):
            base = f"{p}stages.{s}.{bi}"
            inp = x
            y = F.conv2d(x.permute(0, 3, 1, 2),
                         g[f"{base}.dwconv.weight"],
                         g[f"{base}.dwconv.bias"], padding=3,
                         groups=x.shape[-1]).permute(0, 2, 3, 1)
            y = ln_cl(y, g[f"{base}.norm.weight"], g[f"{base}.norm.bias"])
            y = F.linear(y, g[f"{base}.pwconv1.weight"],
                         g[f"{base}.pwconv1.bias"])
            y = F.gelu(y)
            y = F.linear(y, g[f"{base}.pwconv2.weight"],
                         g[f"{base}.pwconv2.bias"])
            x = inp + g[f"{base}.gamma"] * y

    seq = x.mean(dim=1) if x.shape[1] > 1 else x[:, 0]  # (B, W/4, C)
    seq = F.linear(seq, g[f"{p}patch_embed.proj.weight"],
                   g[f"{p}patch_embed.proj.bias"])
    cls = g[f"{p}cls_token"].expand(seq.shape[0], 1, VIT_DIM)
    seq = torch.cat([cls, seq], dim=1) + g[f"{p}pos_embed"]
    heads = max(1, VIT_DIM // 64)
    for i in range(VIT_DEPTH):
        base = f"{p}blocks.{i}"
        b_, n_, d_ = seq.shape
        y = F.layer_norm(seq, (d_,), g[f"{base}.norm1.weight"],
                         g[f"{base}.norm1.bias"], eps=1e-6)
        qkv = F.linear(y, g[f"{base}.attn.qkv.weight"],
                       g[f"{base}.attn.qkv.bias"])
        q, k, v = qkv.reshape(b_, n_, 3, heads, d_ // heads) \
            .permute(2, 0, 3, 1, 4).unbind(0)
        attn = torch.softmax(q @ k.transpose(-2, -1)
                             * ((d_ // heads) ** -0.5), dim=-1)
        y = (attn @ v).transpose(1, 2).reshape(b_, n_, d_)
        seq = seq + F.linear(y, g[f"{base}.attn.proj.weight"],
                             g[f"{base}.attn.proj.bias"])
        y = F.layer_norm(seq, (d_,), g[f"{base}.norm2.weight"],
                         g[f"{base}.norm2.bias"], eps=1e-6)
        y = F.linear(y, g[f"{base}.mlp.fc1.weight"],
                     g[f"{base}.mlp.fc1.bias"])
        y = F.gelu(y)
        seq = seq + F.linear(y, g[f"{base}.mlp.fc2.weight"],
                             g[f"{base}.mlp.fc2.bias"])
    seq = F.layer_norm(seq, (VIT_DIM,), g[f"{p}norm.weight"],
                       g[f"{p}norm.bias"], eps=1e-6)
    out = F.linear(seq[:, 1:], g[f"{p}head.weight"], g[f"{p}head.bias"])
    return out.numpy()
