"""Functional PyTorch oracles for the three full networks.

These consume state dicts with the *reference checkpoint key names*
(see marconet_tpu/convert/torch_import.py) and compute the forward passes
functionally (no nn.Module trees). They serve two purposes in tests:

1. validate the checkpoint converter end-to-end: a state dict with the
   released checkpoints' exact key names is built with random weights,
   converted, and the JAX models must reproduce the oracle outputs;
2. pin the numerics of the whole pipeline at full scale.

Written from the op-level semantics documented in SURVEY.md §2.4-2.6.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F

T = torch.from_numpy
SQRT2 = math.sqrt(2.0)


def _g(rng, *shape, s=1.0):
    return (rng.standard_normal(shape) * s).astype(np.float32)


# ---------------------------------------------------------------------------
# primitive forwards
# ---------------------------------------------------------------------------


def flrelu(x, bias=None):
    if bias is not None:
        x = x + bias  # caller provides a broadcast-ready bias
    return F.leaky_relu(x, 0.2) * SQRT2


def eq_linear(sd, p, x, lr_mul=1.0, act=None):
    w = T(sd[f"{p}.weight"])
    b = T(sd[f"{p}.bias"]) * lr_mul
    scale = (1.0 / math.sqrt(w.shape[1])) * lr_mul
    y = F.linear(x, w * scale)
    if act == "fused_lrelu":
        return F.leaky_relu(y + b, 0.2) * SQRT2
    return y + b


def sn_conv(sd, p, x, stride=1, padding=1):
    w = T(sd[f"{p}.weight_orig"])
    u, v = T(sd[f"{p}.weight_u"]), T(sd[f"{p}.weight_v"])
    sigma = torch.dot(u, w.reshape(w.shape[0], -1) @ v)
    return F.conv2d(x, w / sigma, T(sd[f"{p}.bias"]), stride=stride,
                    padding=padding)


def group_norm(sd, p, x):
    c = x.shape[1]
    return F.group_norm(x, c // 32, T(sd[f"{p}.weight"]),
                        T(sd[f"{p}.bias"]), eps=1e-6)


def res_text_block(sd, p, x_in):
    x = group_norm(sd, f"{p}.norm1", x_in)
    x = x * torch.sigmoid(x)
    x = sn_conv(sd, f"{p}.conv1", x)
    x = group_norm(sd, f"{p}.norm2", x)
    x = x * torch.sigmoid(x)
    x = sn_conv(sd, f"{p}.conv2", x)
    if f"{p}.conv_out.weight" in sd:
        x_in = F.conv2d(x_in, T(sd[f"{p}.conv_out.weight"]),
                        T(sd[f"{p}.conv_out.bias"]))
    return x + x_in


def layer_norm(sd, p, x):
    return F.layer_norm(x, (x.shape[-1],), T(sd[f"{p}.weight"]),
                        T(sd[f"{p}.bias"]))


def linear(sd, p, x, bias=True):
    return F.linear(x, T(sd[f"{p}.weight"]),
                    T(sd[f"{p}.bias"]) if bias else None)


def up2x(x):
    return F.interpolate(x, scale_factor=2, mode="bilinear",
                         align_corners=False)


def adain(prior, lq):
    def stats(f):
        b, c = f.shape[:2]
        v = f.reshape(b, c, -1).var(dim=2) + 1e-5
        return (f.reshape(b, c, -1).mean(2).view(b, c, 1, 1),
                v.sqrt().view(b, c, 1, 1))

    lm, ls = stats(lq)
    pm, ps = stats(prior)
    return (prior - pm) / ps * ls + lm


# ---------------------------------------------------------------------------
# encoder oracle
# ---------------------------------------------------------------------------

_STAGES = ((3, 32), (4, 64), (6, 128), (6, 256), (3, 512))
_STRIDES = ((2, 1), (1, 1), (2, 1), (1, 1), (1, 1))


def build_encoder_state(rng):
    sd = {}
    sd["resnet.conv1.weight"] = _g(rng, 32, 3, 3, 3, s=0.2)
    cin = 32
    for si, ((blocks, c), stride) in enumerate(zip(_STAGES, _STRIDES),
                                               start=1):
        for bi in range(blocks):
            p = f"resnet.layer{si}.{bi}"
            sd[f"{p}.conv1.weight"] = _g(rng, c, cin, 1, 1, s=0.2)
            sd[f"{p}.conv2.weight"] = _g(rng, c, c, 3, 3, s=0.1)
            if bi == 0 and (stride != (1, 1) or cin != c):
                sd[f"{p}.downsample.0.weight"] = _g(rng, c, cin, 1, 1, s=0.2)
            cin = c
    dim, mlp = 512, 1024

    def ln(p, n):
        sd[f"{p}.weight"] = _g(rng, n, s=0.2) + 1.0
        sd[f"{p}.bias"] = _g(rng, n, s=0.1)

    def fc(p, o, i, bias=True):
        sd[f"{p}.weight"] = _g(rng, o, i, s=1.0 / math.sqrt(i))
        if bias:
            sd[f"{p}.bias"] = _g(rng, o, s=0.02)

    def block(ap, fp, hidden):
        ln(f"{ap}.norm", dim)
        fc(f"{ap}.to_qkv", 1536, dim, bias=False)
        fc(f"{ap}.to_out", dim, 512, bias=False)
        ln(f"{fp}.net.0", dim)
        fc(f"{fp}.net.1", hidden, dim)
        fc(f"{fp}.net.3", dim, hidden)

    fc("transformer.to_patch_embedding.1", dim, 8 * 8 * 512)
    t = "transformer.transformer"
    block(f"{t}.layers.0.0", f"{t}.layers.0.1", mlp)
    block(f"{t}.layers.1.0", f"{t}.layers.1.1", mlp)
    block(f"{t}.layers_cls.0.0", f"{t}.layers_cls.0.1", mlp)
    block(f"{t}.layers_locs.0.0", f"{t}.layers_locs.0.1", mlp // 2)
    block(f"{t}.layers_w.0.0", f"{t}.layers_w.0.1", mlp // 2)
    ln(f"{t}.linear_seq_maxlen.0", 64)
    fc(f"{t}.linear_seq_maxlen.1", 16, 64)
    ln("transformer.linear_cls.0", dim)
    fc("transformer.linear_cls.1", 6736, dim)
    ln("transformer.linear_locs.0", dim)
    fc("transformer.linear_locs.1", 256, dim)
    fc("transformer.linear_locs.3", 2, 256)
    ln("transformer.linear_w_maxlen.0", 64)
    fc("transformer.linear_w_maxlen.1", 1, 64)
    ln("transformer.linear_w.0", dim)
    fc("transformer.linear_w.1", 512, dim)
    return sd


def _posemb(h, w, dim):
    y, x = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    omega = torch.arange(dim // 4) / (dim // 4 - 1)
    omega = 1.0 / (10000 ** omega)
    y = y.flatten().float()[:, None] * omega[None, :]
    x = x.flatten().float()[:, None] * omega[None, :]
    return torch.cat((x.sin(), x.cos(), y.sin(), y.cos()), dim=1).float()


def _attn(sd, p, x):
    h = 8
    xn = layer_norm(sd, f"{p}.norm", x)
    qkv = linear(sd, f"{p}.to_qkv", xn, bias=False)
    q, k, v = qkv.chunk(3, dim=-1)
    b, n, _ = q.shape

    def sp(t):
        return t.reshape(b, n, h, 64).permute(0, 2, 1, 3)

    q, k, v = sp(q), sp(k), sp(v)
    a = torch.softmax(q @ k.transpose(-1, -2) * (64 ** -0.5), dim=-1)
    o = (a @ v).permute(0, 2, 1, 3).reshape(b, n, h * 64)
    return linear(sd, f"{p}.to_out", o, bias=False)


def _ff(sd, p, x):
    y = layer_norm(sd, f"{p}.net.0", x)
    y = linear(sd, f"{p}.net.1", y)
    y = F.gelu(y)
    return linear(sd, f"{p}.net.3", y)


def _tblock(sd, ap, fp, x):
    x = _attn(sd, ap, x) + x
    return _ff(sd, fp, x) + x


def encoder_forward(sd, x_nchw):
    x = T(x_nchw)
    x = F.conv2d(x, T(sd["resnet.conv1.weight"]), padding=1).relu()
    cin = 32
    for si, ((blocks, c), stride) in enumerate(zip(_STAGES, _STRIDES),
                                               start=1):
        for bi in range(blocks):
            p = f"resnet.layer{si}.{bi}"
            st = stride if bi == 0 else (1, 1)
            out = F.conv2d(x, T(sd[f"{p}.conv1.weight"])).relu()
            out = F.conv2d(out, T(sd[f"{p}.conv2.weight"]), stride=st,
                           padding=1)
            res = x
            if f"{p}.downsample.0.weight" in sd:
                res = F.conv2d(x, T(sd[f"{p}.downsample.0.weight"]),
                               stride=st)
            x = (out + res).relu()
            cin = c
    # patchify 'b c (h p1) (w p2) -> b (h w) (p1 p2 c)'
    b, c, hh, ww = x.shape
    pp = 8
    x = x.reshape(b, c, hh // pp, pp, ww // pp, pp)
    x = x.permute(0, 2, 4, 3, 5, 1).reshape(b, (hh // pp) * (ww // pp),
                                            pp * pp * c)
    x = linear(sd, "transformer.to_patch_embedding.1", x)
    x = x + _posemb(hh // pp, ww // pp, 512)

    t = "transformer.transformer"
    x = _tblock(sd, f"{t}.layers.0.0", f"{t}.layers.0.1", x)
    x = _tblock(sd, f"{t}.layers.1.0", f"{t}.layers.1.1", x)
    x_cls = _tblock(sd, f"{t}.layers_cls.0.0", f"{t}.layers_cls.0.1", x)
    x16 = x.permute(0, 2, 1)
    x16 = layer_norm(sd, f"{t}.linear_seq_maxlen.0", x16)
    x16 = linear(sd, f"{t}.linear_seq_maxlen.1", x16).permute(0, 2, 1)
    x_loc = _tblock(sd, f"{t}.layers_locs.0.0", f"{t}.layers_locs.0.1", x16)
    x_w = _tblock(sd, f"{t}.layers_w.0.0", f"{t}.layers_w.0.1", x)

    logits = linear(sd, "transformer.linear_cls.1",
                    layer_norm(sd, "transformer.linear_cls.0", x_cls))
    lo = layer_norm(sd, "transformer.linear_locs.0", x_loc)
    lo = F.gelu(linear(sd, "transformer.linear_locs.1", lo))
    locs = torch.sigmoid(linear(sd, "transformer.linear_locs.3", lo))
    locs = locs.reshape(b, -1)
    xw = x_w.permute(0, 2, 1)
    xw = layer_norm(sd, "transformer.linear_w_maxlen.0", xw)
    xw = linear(sd, "transformer.linear_w_maxlen.1", xw).permute(0, 2, 1)
    w = linear(sd, "transformer.linear_w.1",
               layer_norm(sd, "transformer.linear_w.0",
                          xw.reshape(b, 512)))
    return (logits.numpy(), locs.numpy(), w.numpy())


# ---------------------------------------------------------------------------
# prior generator oracle
# ---------------------------------------------------------------------------

_GEN_CH = {4: 512, 8: 512, 16: 512, 32: 512, 64: 256, 128: 128}


def build_prior_state(rng, num_classes=6736):
    sd = {}
    g = "TextGenerator"
    for i in range(1, 9):
        sd[f"{g}.style_mlp.{i}.weight"] = _g(rng, 512, 512, s=1.0)
        sd[f"{g}.style_mlp.{i}.bias"] = _g(rng, 512, s=0.02)
    sd[f"{g}.input_text.TextEmbeddings"] = _g(rng, num_classes, 512, 1, 1)

    def styled(p, ci, co, k=3):
        sd[f"{p}.conv.weight"] = _g(rng, 1, co, ci, k, k)
        sd[f"{p}.conv.modulation.weight"] = _g(rng, ci, 512,
                                               s=1.0 / math.sqrt(512))
        sd[f"{p}.conv.modulation.bias"] = 1.0 + _g(rng, ci, s=0.02)
        sd[f"{p}.bias"] = _g(rng, 1, co, 1, 1, s=0.02)
        sd[f"{p}.activate.bias"] = _g(rng, co, s=0.02)

    def torgb(p, ci):
        sd[f"{p}.conv.weight"] = _g(rng, 1, 3, ci, 1, 1)
        sd[f"{p}.conv.modulation.weight"] = _g(rng, ci, 512,
                                               s=1.0 / math.sqrt(512))
        sd[f"{p}.conv.modulation.bias"] = 1.0 + _g(rng, ci, s=0.02)
        sd[f"{p}.bias"] = _g(rng, 1, 3, 1, 1, s=0.02)

    styled(f"{g}.conv1", 512, 512)
    torgb(f"{g}.to_rgb1", 512)
    cin = 512
    for i, res in enumerate((8, 16, 32, 64, 128)):
        co = _GEN_CH[res]
        styled(f"{g}.convs.{2 * i}", cin, co)
        styled(f"{g}.convs.{2 * i + 1}", co, co)
        torgb(f"{g}.to_rgbs.{i}", co)
        cin = co
    return sd


def _mod_conv(sd, p, x, style, demodulate=True, upsample=False):
    b, ci, h, w = x.shape
    weight = T(sd[f"{p}.weight"])  # (1, O, I, k, k)
    co, k = weight.shape[1], weight.shape[-1]
    s = eq_linear(sd, f"{p}.modulation", style).view(b, 1, ci, 1, 1)
    wt = (1.0 / math.sqrt(ci * k * k)) * weight * s
    if demodulate:
        d = torch.rsqrt(wt.pow(2).sum([2, 3, 4]) + 1e-8)
        wt = wt * d.view(b, co, 1, 1, 1)
    wt = wt.view(b * co, ci, k, k)
    if upsample:
        x = up2x(x)
        h, w = 2 * h, 2 * w
    y = F.conv2d(x.reshape(1, b * ci, h, w), wt, padding=k // 2, groups=b)
    return y.view(b, co, h, w)


def _styled_conv(sd, p, x, style, upsample=False):
    y = _mod_conv(sd, f"{p}.conv", x, style, upsample=upsample)
    y = y + T(sd[f"{p}.bias"])
    return flrelu(y, T(sd[f"{p}.activate.bias"]).view(1, -1, 1, 1))


def _to_rgb(sd, p, x, style, skip=None):
    y = _mod_conv(sd, f"{p}.conv", x, style, demodulate=False)
    y = y + T(sd[f"{p}.bias"])
    if skip is not None:
        y = y + up2x(skip)
    return torch.tanh(y)


def prior_forward(sd, styles, labels):
    g = "TextGenerator"
    z = T(styles)
    z = z * torch.rsqrt(torch.mean(z ** 2, dim=1, keepdim=True) + 1e-8)
    for i in range(1, 9):
        z = eq_linear(sd, f"{g}.style_mlp.{i}", z, lr_mul=0.01,
                      act="fused_lrelu")
    emb = T(sd[f"{g}.input_text.TextEmbeddings"])
    x = emb[labels.reshape(-1)].repeat(1, 1, 4, 4)

    x = _styled_conv(sd, f"{g}.conv1", x, z)
    y = _mod_conv(sd, f"{g}.to_rgb1.conv", x, z, demodulate=False)
    skip = torch.tanh(y + T(sd[f"{g}.to_rgb1.bias"]))
    f64 = f32 = None
    cin = 512
    for i, res in enumerate((8, 16, 32, 64, 128)):
        x = _styled_conv(sd, f"{g}.convs.{2 * i}", x, z, upsample=True)
        x = _styled_conv(sd, f"{g}.convs.{2 * i + 1}", x, z)
        skip = _to_rgb(sd, f"{g}.to_rgbs.{i}", x, z, skip)
        if res == 32:
            f32 = x.clone()
        if res == 64:
            f64 = x.clone()
    return skip.numpy(), f64.numpy(), f32.numpy()


# ---------------------------------------------------------------------------
# SR net oracle
# ---------------------------------------------------------------------------


def build_srnet_state(rng, d=256):
    sd = {}

    def sn(p, co, ci, k=3, scale=0.1):
        w = _g(rng, co, ci, k, k, s=scale)
        wm = w.reshape(co, -1)
        u = rng.standard_normal(co).astype(np.float32)
        v = rng.standard_normal(wm.shape[1]).astype(np.float32)
        for _ in range(30):
            v = wm.T @ u
            v /= max(np.linalg.norm(v), 1e-12)
            u = wm @ v
            u /= max(np.linalg.norm(u), 1e-12)
        sd[f"{p}.weight_orig"] = w
        sd[f"{p}.weight_u"] = u.astype(np.float32)
        sd[f"{p}.weight_v"] = v.astype(np.float32)
        sd[f"{p}.bias"] = _g(rng, co, s=0.02)

    def gn(p, c):
        sd[f"{p}.weight"] = 1.0 + _g(rng, c, s=0.1)
        sd[f"{p}.bias"] = _g(rng, c, s=0.05)

    def res_block(p, ci, co):
        gn(f"{p}.norm1", ci)
        sn(f"{p}.conv1", co, ci)
        gn(f"{p}.norm2", co)
        sn(f"{p}.conv2", co, co)
        if ci != co:
            sd[f"{p}.conv_out.weight"] = _g(rng, co, ci, 1, 1, s=0.1)
            sd[f"{p}.conv_out.bias"] = _g(rng, co, s=0.02)

    sn("conv_first_32.0", d // 4, 3)
    sn("conv_first_16.0", d // 2, d // 4)
    sn("conv_first_8.0", d, d // 2)
    sn("conv_first_8.2", d, d)
    sn("conv_body_16.0", d, d + d // 2)
    sn("conv_body_16.2", d, d)
    sn("conv_body_32.0", d, d + d // 4)
    sn("conv_body_32.2", d, d)
    sn("conv_up.1", d, d)
    res_block("conv_up.3", d, d)
    sn("conv_up.4", d, d)
    sn("conv_final.0", d // 2, d)
    sn("conv_final.3", d // 4, d // 2)
    res_block("conv_final.5", d // 4, d // 4)
    sn("conv_final.6", 3, d // 4)
    sn("conv_32_to256.0", d, 512)
    sn("conv_32_to256.2", d, d)
    for s in (32, 64):
        res_block(f"conv_{s}_fuse.0", 2 * d, d)
        for part in ("scale", "shift"):
            sn(f"conv_{s}_{part}.0", d, d)
            sn(f"conv_{s}_{part}.2", d, d)
    return sd


def _sn_stack(sd, p, x):
    x = F.leaky_relu(sn_conv(sd, f"{p}.0", x), 0.2)
    return sn_conv(sd, f"{p}.2", x)


def _sft_loop(sd, scale_tag, sq, priors, locs, hw):
    """Per-character windowed SFT with last-writer-wins overlap."""
    W = sq.shape[-1]
    res = torch.zeros_like(sq)
    n = priors.shape[0]
    for c in range(n):
        center = int(float(locs[0, 2 * c]) * W)
        x1 = 0 if center < hw else center - hw
        x2 = W if center + hw > W else center + hw
        L = x2 - x1
        y1 = hw - L // 2
        pf = priors[c:c + 1, :, :, y1:y1 + L]
        lf = sq[:, :, :, x1:x2]
        ad = adain(pf, lf)
        fuse = res_text_block(sd, f"conv_{scale_tag}_fuse.0",
                              torch.cat((ad, lf), dim=1))
        sc = _sn_stack(sd, f"conv_{scale_tag}_scale", fuse)
        sh = _sn_stack(sd, f"conv_{scale_tag}_shift", fuse)
        res[0, :, :, x1:x2] = lf[0] * sc[0] + sh[0]
    return sq + res


def srnet_forward(sd, lq, p64, p32, locs):
    """lq (1,3,32,512); p64 (n,256,64,64); p32 (n,512,32,32); locs (1,2n)."""
    x = T(lq)
    f32 = F.leaky_relu(sn_conv(sd, "conv_first_32.0", x), 0.2)
    f16 = F.leaky_relu(sn_conv(sd, "conv_first_16.0", f32, stride=2), 0.2)
    f8 = sn_conv(sd, "conv_first_8.2",
                 F.leaky_relu(sn_conv(sd, "conv_first_8.0", f16, stride=2),
                              0.2))
    s16 = sn_conv(sd, "conv_body_16.2", F.leaky_relu(
        sn_conv(sd, "conv_body_16.0",
                torch.cat((up2x(f8), f16), dim=1)), 0.2))
    s32 = sn_conv(sd, "conv_body_32.2", F.leaky_relu(
        sn_conv(sd, "conv_body_32.0",
                torch.cat((up2x(s16), f32), dim=1)), 0.2))

    p32t = _sn_stack(sd, "conv_32_to256", T(p32))
    s32 = _sft_loop(sd, 32, s32, p32t, T(locs), 16)

    u = F.leaky_relu(sn_conv(sd, "conv_up.1", up2x(s32)), 0.2)
    u = res_text_block(sd, "conv_up.3", u)
    s64 = sn_conv(sd, "conv_up.4", u)

    s64 = _sft_loop(sd, 64, s64, T(p64), T(locs), 32)

    y = F.leaky_relu(sn_conv(sd, "conv_final.0", s64), 0.2)
    y = F.leaky_relu(sn_conv(sd, "conv_final.3", up2x(y)), 0.2)
    y = res_text_block(sd, "conv_final.5", y)
    y = torch.tanh(sn_conv(sd, "conv_final.6", y))
    return y.numpy()
