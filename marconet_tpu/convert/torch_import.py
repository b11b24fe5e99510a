"""PyTorch checkpoint -> JAX pytree conversion.

Maps the reference's released ``.pth`` state dicts (keys per the module
trees in reference ``models/networks.py``, ``models/textvit_arch.py``,
``models/resnet.py``) onto this package's flax variable trees:

- ``net_transformer_encoder.pth`` -> ``TextContextEncoder`` variables
- ``net_prior_generation.pth``    -> ``StructurePriorGenerator`` variables
- ``net_sr.pth``                  -> ``StructurePriorSRNet`` variables

Layout transforms:
- conv ``(O, I, kh, kw)`` -> HWIO ``(kh, kw, I, O)``
- linear ``(O, I)`` -> ``(I, O)``
- modulated-conv weight ``(1, O, I, k, k)`` -> ``(k, k, I, O)``
- per-channel biases ``(1, C, 1, 1)`` -> ``(C,)``
- codebook ``(classes, C, 1, 1)`` -> ``(classes, C)``
- spectral norm: ``weight_orig``/``weight_u``/``weight_v`` -> params kernel
  + ``spectral`` collection ``u``/``v`` (torch eval semantics preserved:
  sigma recomputed from the stored vectors at apply time).

Checkpoints are loaded with ``torch.load(map_location='cpu')`` and the
``params`` key (inference releases) or ``params_ema`` (training
warm-starts), matching reference ``test_sr.py:43-51`` /
``Train/options/train.yml:73``.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Mapping

import numpy as np

Array = np.ndarray
StateDict = Mapping[str, Array]


# ---------------------------------------------------------------------------
# layout transforms
# ---------------------------------------------------------------------------


def _t_conv(w: Array) -> Array:
    """(O, I, kh, kw) -> (kh, kw, I, O)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _t_linear(w: Array) -> Array:
    """(O, I) -> (I, O)."""
    return np.ascontiguousarray(w.T)


def _t_modconv(w: Array) -> Array:
    """(1, O, I, k, k) -> (k, k, I, O)."""
    return np.ascontiguousarray(np.transpose(w[0], (2, 3, 1, 0)))


def _t_vec(w: Array) -> Array:
    return np.ascontiguousarray(w.reshape(-1))


def _np(state: StateDict, key: str) -> Array:
    try:
        v = state[key]
    except KeyError as e:
        raise KeyError(
            f"checkpoint is missing key {key!r}; available keys start "
            f"with: {sorted(state)[:5]}") from e
    return np.asarray(v, dtype=np.float32)


class _StrictState(dict):
    """State-dict view that records reads, so converters can assert FULL
    key consumption — a renamed or extra torch key is an error, never a
    silent drop (matches the reference's strict loading,
    ``test_sr.py:43-51``)."""

    def __init__(self, state: StateDict):
        super().__init__(state)
        self.consumed: set = set()

    def __getitem__(self, key):
        v = super().__getitem__(key)
        self.consumed.add(key)
        return v

    def __contains__(self, key):
        # membership tests are structural probes, not consumption
        return super().__contains__(key)

    def assert_all_consumed(self, what: str, ignore: tuple = ()):
        import re

        pats = [re.compile(p) for p in ignore]
        left = [k for k in self
                if k not in self.consumed
                and not any(p.search(k) for p in pats)]
        if left:
            raise KeyError(
                f"{what}: {len(left)} state-dict keys were not mapped "
                f"(renamed/extra layers?): {sorted(left)[:10]}")


def _strict(state: StateDict) -> "_StrictState":
    return state if isinstance(state, _StrictState) else _StrictState(state)


# ---------------------------------------------------------------------------
# shared sub-layer converters
# ---------------------------------------------------------------------------


def _layernorm(state: StateDict, prefix: str) -> Dict[str, Array]:
    return {"scale": _np(state, f"{prefix}.weight"),
            "bias": _np(state, f"{prefix}.bias")}


def _dense(state: StateDict, prefix: str, bias: bool = True):
    out = {"kernel": _t_linear(_np(state, f"{prefix}.weight"))}
    if bias:
        out["bias"] = _np(state, f"{prefix}.bias")
    return out


def _equal_linear(state: StateDict, prefix: str) -> Dict[str, Array]:
    return {"kernel": _t_linear(_np(state, f"{prefix}.weight")),
            "bias": _np(state, f"{prefix}.bias")}


def _sn_conv(state: StateDict, prefix: str):
    """Spectral-norm conv -> (params, spectral) dicts."""
    params = {"kernel": _t_conv(_np(state, f"{prefix}.weight_orig")),
              "bias": _np(state, f"{prefix}.bias")}
    spectral = {"u": _np(state, f"{prefix}.weight_u"),
                "v": _np(state, f"{prefix}.weight_v")}
    return params, spectral


def _attention(state: StateDict, prefix: str) -> Dict[str, Any]:
    return {
        "norm": _layernorm(state, f"{prefix}.norm"),
        "to_qkv": _dense(state, f"{prefix}.to_qkv", bias=False),
        "to_out": _dense(state, f"{prefix}.to_out", bias=False),
    }


def _feedforward(state: StateDict, prefix: str) -> Dict[str, Any]:
    # torch Sequential: 0=LayerNorm, 1=Linear, 2=GELU, 3=Linear
    return {
        "norm": _layernorm(state, f"{prefix}.net.0"),
        "fc1": _dense(state, f"{prefix}.net.1"),
        "fc2": _dense(state, f"{prefix}.net.3"),
    }


def _encoder_block(state: StateDict, attn_prefix: str,
                   ff_prefix: str) -> Dict[str, Any]:
    return {"attn": _attention(state, attn_prefix),
            "ff": _feedforward(state, ff_prefix)}


# ---------------------------------------------------------------------------
# model converters
# ---------------------------------------------------------------------------


def convert_encoder(state: StateDict) -> Dict[str, Any]:
    """``net_transformer_encoder.pth['params']`` -> encoder variables."""
    state = _strict(state)
    p: Dict[str, Any] = {}

    # resnet45 backbone
    resnet: Dict[str, Any] = {
        "conv1": {"kernel": _t_conv(_np(state, "resnet.conv1.weight"))}}
    stage_blocks = (3, 4, 6, 6, 3)
    for si, blocks in enumerate(stage_blocks, start=1):
        for bi in range(blocks):
            tp = f"resnet.layer{si}.{bi}"
            blk = {
                "conv1": {"kernel": _t_conv(_np(state, f"{tp}.conv1.weight"))},
                "conv2": {"kernel": _t_conv(_np(state, f"{tp}.conv2.weight"))},
            }
            if f"{tp}.downsample.0.weight" in state:
                blk["downsample"] = {
                    "kernel": _t_conv(_np(state, f"{tp}.downsample.0.weight"))}
            resnet[f"layer{si}_{bi}"] = blk
    p["resnet"] = resnet

    # ViT head
    t = "transformer.transformer"
    vit: Dict[str, Any] = {
        "patch_embed": _dense(state, "transformer.to_patch_embedding.1"),
        "shared_0": _encoder_block(state, f"{t}.layers.0.0",
                                   f"{t}.layers.0.1"),
        "shared_1": _encoder_block(state, f"{t}.layers.1.0",
                                   f"{t}.layers.1.1"),
        "branch_cls": _encoder_block(state, f"{t}.layers_cls.0.0",
                                     f"{t}.layers_cls.0.1"),
        "branch_locs": _encoder_block(state, f"{t}.layers_locs.0.0",
                                      f"{t}.layers_locs.0.1"),
        "branch_w": _encoder_block(state, f"{t}.layers_w.0.0",
                                   f"{t}.layers_w.0.1"),
        "seq_to_maxlen": {
            "norm": _layernorm(state, f"{t}.linear_seq_maxlen.0"),
            "proj": _dense(state, f"{t}.linear_seq_maxlen.1"),
        },
        "head_cls_norm": _layernorm(state, "transformer.linear_cls.0"),
        "head_cls_proj": _dense(state, "transformer.linear_cls.1"),
        "head_locs_norm": _layernorm(state, "transformer.linear_locs.0"),
        "head_locs_fc1": _dense(state, "transformer.linear_locs.1"),
        "head_locs_fc2": _dense(state, "transformer.linear_locs.3"),
        "w_seq_pool": {
            "norm": _layernorm(state, "transformer.linear_w_maxlen.0"),
            "proj": _dense(state, "transformer.linear_w_maxlen.1"),
        },
        "head_w_norm": _layernorm(state, "transformer.linear_w.0"),
        "head_w_proj": _dense(state, "transformer.linear_w.1"),
    }
    p["vit"] = vit
    state.assert_all_consumed("convert_encoder")
    return {"params": p}


def _styled_conv(state: StateDict, prefix: str) -> Dict[str, Any]:
    return {
        "conv": {
            "weight": _t_modconv(_np(state, f"{prefix}.conv.weight")),
            "modulation": _equal_linear(state, f"{prefix}.conv.modulation"),
        },
        "bias": _t_vec(_np(state, f"{prefix}.bias")),
        "act_bias": _np(state, f"{prefix}.activate.bias"),
    }


def _to_rgb(state: StateDict, prefix: str) -> Dict[str, Any]:
    return {
        "conv": {
            "weight": _t_modconv(_np(state, f"{prefix}.conv.weight")),
            "modulation": _equal_linear(state, f"{prefix}.conv.modulation"),
        },
        "bias": _t_vec(_np(state, f"{prefix}.bias")),
    }


def convert_prior(state: StateDict) -> Dict[str, Any]:
    """``net_prior_generation.pth['params']`` -> generator variables."""
    state = _strict(state)
    g = "TextGenerator"
    p: Dict[str, Any] = {
        "style_mlp": {
            # Sequential: 0=PixelNorm, 1..8=EqualLinear
            f"fc{i}": _equal_linear(state, f"{g}.style_mlp.{i + 1}")
            for i in range(8)
        },
        "codebook": {
            "embeddings": _np(state, f"{g}.input_text.TextEmbeddings")
            .reshape(-1, 512)},
        "conv_4": _styled_conv(state, f"{g}.conv1"),
        "to_rgb_4": _to_rgb(state, f"{g}.to_rgb1"),
    }
    # pyramid: convs[2i] = upsample conv, convs[2i+1] = plain, to_rgbs[i]
    for i, res in enumerate((8, 16, 32, 64, 128)):
        p[f"conv_{res}_up"] = _styled_conv(state, f"{g}.convs.{2 * i}")
        p[f"conv_{res}"] = _styled_conv(state, f"{g}.convs.{2 * i + 1}")
        p[f"to_rgb_{res}"] = _to_rgb(state, f"{g}.to_rgbs.{i}")
    # noise buffers would be dead weight (the reference never injects
    # noise, networks.py:144-151) — but none are registered upstream, so
    # stay strict with no ignore patterns
    state.assert_all_consumed("convert_prior")
    return {"params": p}


def _res_text_block(state: StateDict, prefix: str):
    params: Dict[str, Any] = {
        "norm1": _layernorm(state, f"{prefix}.norm1"),
        "norm2": _layernorm(state, f"{prefix}.norm2"),
    }
    spectral: Dict[str, Any] = {}
    for name in ("conv1", "conv2"):
        cp, cs = _sn_conv(state, f"{prefix}.{name}")
        params[name] = cp
        spectral[name] = cs
    if f"{prefix}.conv_out.weight" in state:
        params["conv_out"] = {
            "kernel": _t_conv(_np(state, f"{prefix}.conv_out.weight")),
            "bias": _np(state, f"{prefix}.conv_out.bias")}
    return params, spectral


def convert_srnet(state: StateDict) -> Dict[str, Any]:
    """``net_sr.pth['params']`` -> SR-net variables."""
    state = _strict(state)
    params: Dict[str, Any] = {}
    spectral: Dict[str, Any] = {}

    def sn(flax_name: str, torch_prefix: str):
        cp, cs = _sn_conv(state, torch_prefix)
        params[flax_name] = cp
        spectral[flax_name] = cs

    def stack(flax_name: str, torch_prefix: str, idx=(0, 2)):
        """SNConv/lrelu/SNConv sequential -> SNStack {conv1, conv2}."""
        p1, s1 = _sn_conv(state, f"{torch_prefix}.{idx[0]}")
        p2, s2 = _sn_conv(state, f"{torch_prefix}.{idx[1]}")
        params[flax_name] = {"conv1": p1, "conv2": p2}
        spectral[flax_name] = {"conv1": s1, "conv2": s2}

    def resblock(flax_name: str, torch_prefix: str):
        rp, rs = _res_text_block(state, torch_prefix)
        params[flax_name] = rp
        spectral[flax_name] = rs

    sn("first_32", "conv_first_32.0")
    sn("first_16", "conv_first_16.0")
    sn("first_8a", "conv_first_8.0")
    sn("first_8b", "conv_first_8.2")
    sn("body_16a", "conv_body_16.0")
    sn("body_16b", "conv_body_16.2")
    sn("body_32a", "conv_body_32.0")
    sn("body_32b", "conv_body_32.2")

    stack("to256", "conv_32_to256")
    for scale in (32, 64):
        sft_p: Dict[str, Any] = {}
        sft_s: Dict[str, Any] = {}
        rp, rs = _res_text_block(state, f"conv_{scale}_fuse.0")
        sft_p["fuse"], sft_s["fuse"] = rp, rs
        for part in ("scale", "shift"):
            p1, s1 = _sn_conv(state, f"conv_{scale}_{part}.0")
            p2, s2 = _sn_conv(state, f"conv_{scale}_{part}.2")
            sft_p[part] = {"conv1": p1, "conv2": p2}
            sft_s[part] = {"conv1": s1, "conv2": s2}
        params[f"sft_{scale}"] = sft_p
        spectral[f"sft_{scale}"] = sft_s

    # conv_up: 0=Upsample, 1=SN, 2=lrelu, 3=ResTextBlockV2, 4=SN
    sn("up_a", "conv_up.1")
    resblock("up_res", "conv_up.3")
    sn("up_b", "conv_up.4")

    # conv_final: 0=SN, 1=lrelu, 2=Up, 3=SN, 4=lrelu, 5=Res, 6=SN, 7=Tanh
    sn("final_a", "conv_final.0")
    sn("final_b", "conv_final.3")
    resblock("final_res", "conv_final.5")
    sn("final_out", "conv_final.6")

    state.assert_all_consumed("convert_srnet")
    return {"params": params, "spectral": spectral}


def convert_discriminator(state: StateDict) -> Dict[str, Any]:
    """``net_d.pth`` / ``net_srd.pth`` (basicsr ``UNetDiscriminatorSN``)
    -> discriminator variables. conv0/conv9 are plain convs; conv1..conv8
    are spectral-normalized and bias-free."""
    state = _strict(state)
    params: Dict[str, Any] = {}
    spectral: Dict[str, Any] = {}
    for name in ("conv0", "conv9"):
        params[name] = {"kernel": _t_conv(_np(state, f"{name}.weight")),
                        "bias": _np(state, f"{name}.bias")}
    for i in range(1, 9):
        name = f"conv{i}"
        params[name] = {
            "kernel": _t_conv(_np(state, f"{name}.weight_orig"))}
        spectral[name] = {"u": _np(state, f"{name}.weight_u"),
                          "v": _np(state, f"{name}.weight_v")}
    state.assert_all_consumed("convert_discriminator")
    return {"params": params, "spectral": spectral}


# ---------------------------------------------------------------------------
# checkpoint IO
# ---------------------------------------------------------------------------


def load_torch_state_dict(path: str, param_key: str = "params") -> StateDict:
    """Load a reference ``.pth`` checkpoint into numpy arrays.

    Tries ``param_key`` first, then the reference's other container keys
    (inference releases use ``params``, training warm-starts
    ``params_ema`` — ``test_sr.py:43-51``, ``train.yml:69``)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    for key in (param_key, "params", "params_ema", "state_dict"):
        if key in ckpt:
            ckpt = ckpt[key]
            break
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in ckpt.items()}


def load_reference_checkpoints(ckpt_dir: str):
    """Load + convert the three released checkpoints from a directory.

    Expects ``net_transformer_encoder.pth``, ``net_prior_generation.pth``
    and ``net_sr.pth`` (reference ``checkpoints/download_github.py:1-11``).
    Returns a ``MARCONetParams``.
    """
    from marconet_tpu.models.pipeline import MARCONetParams

    enc = convert_encoder(load_torch_state_dict(
        os.path.join(ckpt_dir, "net_transformer_encoder.pth")))
    pri = convert_prior(load_torch_state_dict(
        os.path.join(ckpt_dir, "net_prior_generation.pth")))
    srn = convert_srnet(load_torch_state_dict(
        os.path.join(ckpt_dir, "net_sr.pth")))
    return MARCONetParams(enc, pri, srn)
