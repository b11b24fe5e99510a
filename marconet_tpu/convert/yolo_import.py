"""Ultralytics YOLO11 checkpoint -> JAX variables.

Maps an ultralytics ``yolo11*.pt`` state dict (``model.{idx}.*`` keys for
the yolo11.yaml layer list) onto ``marconet_tpu.models.yolo.YOLO11``. The
released ``yolo11m_character.pt`` (reference ``checkpoints/
download_github.py``) is a pickled ultralytics bundle: loading it directly
requires the ``ultralytics`` package; without it, export a plain state
dict first (``torch.save(YOLO('yolo11m_character.pt').model.state_dict(),
'yolo11m_character_sd.pth')``) and pass that file here.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

Array = np.ndarray
StateDict = Mapping[str, Array]

# yolo11.yaml layer index -> (our module name, kind)
_LAYERS = [
    (0, "b0", "conv"), (1, "b1", "conv"),
    (2, "b2", "c3k2_plain"), (3, "b3", "conv"),
    (4, "b4", "c3k2_plain"), (5, "b5", "conv"),
    (6, "b6", "c3k2_c3k"), (7, "b7", "conv"),
    (8, "b8", "c3k2_c3k"), (9, "b9", "sppf"),
    (10, "b10", "c2psa"),
    (13, "h13", "c3k2_plain"), (16, "h16", "c3k2_plain"),
    (17, "h17", "conv"), (19, "h19", "c3k2_plain"),
    (20, "h20", "conv"), (22, "h22", "c3k2_c3k"),
]


def _np(sd, key):
    try:
        return np.asarray(sd[key], np.float32)
    except KeyError:
        raise KeyError(f"missing key {key!r}") from None


def _t_conv(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _t_dw(w):
    """depthwise torch (C,1,k,k) -> HWIO (k,k,1,C)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _conv_bn(sd, prefix, groups=1):
    w = _np(sd, f"{prefix}.conv.weight")
    params = {"kernel": _t_conv(w),
              "bn": {"scale": _np(sd, f"{prefix}.bn.weight"),
                     "bias": _np(sd, f"{prefix}.bn.bias")}}
    stats = {"bn": {"mean": _np(sd, f"{prefix}.bn.running_mean"),
                    "var": _np(sd, f"{prefix}.bn.running_var")}}
    return params, stats


def _merge(dst_p, dst_s, name, sub):
    p, s = sub
    dst_p[name] = p
    dst_s[name] = s


def _bottleneck(sd, prefix):
    p, s = {}, {}
    _merge(p, s, "cv1", _conv_bn(sd, f"{prefix}.cv1"))
    _merge(p, s, "cv2", _conv_bn(sd, f"{prefix}.cv2"))
    return p, s


def _c3k(sd, prefix):
    p, s = {}, {}
    for cv in ("cv1", "cv2", "cv3"):
        _merge(p, s, cv, _conv_bn(sd, f"{prefix}.{cv}"))
    for i in range(2):
        _merge(p, s, f"m{i}", _bottleneck(sd, f"{prefix}.m.{i}"))
    return p, s


def _c3k2(sd, prefix, c3k: bool, n: int = 1):
    p, s = {}, {}
    _merge(p, s, "cv1", _conv_bn(sd, f"{prefix}.cv1"))
    _merge(p, s, "cv2", _conv_bn(sd, f"{prefix}.cv2"))
    for i in range(n):
        sub = _c3k(sd, f"{prefix}.m.{i}") if c3k else \
            _bottleneck(sd, f"{prefix}.m.{i}")
        _merge(p, s, f"m{i}", sub)
    return p, s


def _sppf(sd, prefix):
    p, s = {}, {}
    _merge(p, s, "cv1", _conv_bn(sd, f"{prefix}.cv1"))
    _merge(p, s, "cv2", _conv_bn(sd, f"{prefix}.cv2"))
    return p, s


def _c2psa(sd, prefix, n: int = 1):
    p, s = {}, {}
    _merge(p, s, "cv1", _conv_bn(sd, f"{prefix}.cv1"))
    _merge(p, s, "cv2", _conv_bn(sd, f"{prefix}.cv2"))
    for i in range(n):
        bp, bs = {}, {}
        ap, as_ = {}, {}
        _merge(ap, as_, "qkv", _conv_bn(sd, f"{prefix}.m.{i}.attn.qkv"))
        _merge(ap, as_, "proj", _conv_bn(sd, f"{prefix}.m.{i}.attn.proj"))
        _merge(ap, as_, "pe", _conv_bn(sd, f"{prefix}.m.{i}.attn.pe"))
        bp["attn"], bs["attn"] = ap, as_
        _merge(bp, bs, "ffn1", _conv_bn(sd, f"{prefix}.m.{i}.ffn.0"))
        _merge(bp, bs, "ffn2", _conv_bn(sd, f"{prefix}.m.{i}.ffn.1"))
        p[f"m{i}"], s[f"m{i}"] = bp, bs
    return p, s


def convert_yolo11(sd: StateDict, detect_idx: int = 23
                   ) -> Dict[str, Any]:
    """state dict (``model.{i}.*``) -> YOLO11 variables
    {'params', 'batch_stats'}."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for idx, name, kind in _LAYERS:
        prefix = f"model.{idx}"
        if kind == "conv":
            sub = _conv_bn(sd, prefix)
        elif kind == "c3k2_plain":
            sub = _c3k2(sd, prefix, c3k=False)
        elif kind == "c3k2_c3k":
            sub = _c3k2(sd, prefix, c3k=True)
        elif kind == "sppf":
            sub = _sppf(sd, prefix)
        elif kind == "c2psa":
            sub = _c2psa(sd, prefix)
        _merge(params, stats, name, sub)

    dp, dstats = {}, {}
    d = f"model.{detect_idx}"
    for i in range(3):
        _merge(dp, dstats, f"cv2_{i}_0", _conv_bn(sd, f"{d}.cv2.{i}.0"))
        _merge(dp, dstats, f"cv2_{i}_1", _conv_bn(sd, f"{d}.cv2.{i}.1"))
        dp[f"cv2_{i}_2"] = {
            "kernel": _t_conv(_np(sd, f"{d}.cv2.{i}.2.weight")),
            "bias": _np(sd, f"{d}.cv2.{i}.2.bias")}
        _merge(dp, dstats, f"cv3_{i}_0_0",
               _conv_bn(sd, f"{d}.cv3.{i}.0.0"))
        _merge(dp, dstats, f"cv3_{i}_0_1",
               _conv_bn(sd, f"{d}.cv3.{i}.0.1"))
        _merge(dp, dstats, f"cv3_{i}_1_0",
               _conv_bn(sd, f"{d}.cv3.{i}.1.0"))
        _merge(dp, dstats, f"cv3_{i}_1_1",
               _conv_bn(sd, f"{d}.cv3.{i}.1.1"))
        dp[f"cv3_{i}_2"] = {
            "kernel": _t_conv(_np(sd, f"{d}.cv3.{i}.2.weight")),
            "bias": _np(sd, f"{d}.cv3.{i}.2.bias")}
    params["detect"] = dp
    stats["detect"] = dstats
    return {"params": params, "batch_stats": stats}


def load_yolo_checkpoint(path: str) -> Dict[str, Any]:
    """Load a .pt/.pth file into YOLO11 variables.

    Accepts a plain state dict, or an ultralytics bundle when the
    ``ultralytics`` package is importable.
    """
    import importlib.util
    import os

    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:
        # ultralytics bundles are pickles of module objects; unpickling
        # is only meaningful (and only possible) with the ultralytics
        # package installed — treat its presence as deliberate opt-in.
        # Anything else needs the explicit unsafe flag.
        if (importlib.util.find_spec("ultralytics") is None
                and os.environ.get("MARCONET_UNSAFE_TORCH_LOAD") != "1"):
            raise RuntimeError(
                f"{path} is not a plain tensor state dict (weights_only "
                f"load failed: {e}). Export a state dict, install "
                "ultralytics (needed to unpickle its bundles anyway), or "
                "set MARCONET_UNSAFE_TORCH_LOAD=1 for a file you trust."
            ) from e
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt and hasattr(
            ckpt["model"], "state_dict"):
        sd = {k: v.float() for k, v in ckpt["model"].state_dict().items()}
    elif isinstance(ckpt, dict):
        sd = ckpt.get("state_dict", ckpt)
    else:
        sd = ckpt.state_dict()
    sd = {k: np.asarray(v.detach() if hasattr(v, "detach") else v,
                        np.float32)
          for k, v in sd.items()}
    return convert_yolo11(sd)
