"""OCR checkpoint converters: ModelScope ConvNextViT + legacy TransformerOCR.

``convert_modelscope_ocr`` maps the exported state dict of ModelScope's
``damo/cv_convnextTiny_ocr-recognition-general_damo`` recognizer
(reference ``test_sr.py:56``) onto ``marconet_tpu.models.convnext_ocr.
ConvNextViT`` variables. The mapping is SHAPE-DRIVEN: stage depths/dims,
ViT width/depth, class count, cls-token/projection presence are all
derived from the state dict, so the returned ``OCRConfig`` always builds
a graph matching the weights. Key conventions follow the public ConvNeXt
(``downsample_layers.*``/``stages.*``) and timm ViT (``blocks.*``)
layouts the ModelScope module reuses; an optional uniform prefix (e.g.
``recognizer.``) is stripped automatically.

``convert_legacy_ocr`` maps the reference's ``TransformerOCR`` state dict
(``models/ocr.py:310-370``; checkpoints ``net_real_world_ocr.pth`` /
``net_new_bbox.pth``, ``checkpoints/download_github.py:6-7``) onto
``marconet_tpu.models.legacy_ocr.LegacyTransformerOCR``.

Every converter is STRICT: after mapping, any state-dict key that was
neither consumed nor explicitly ignored-by-design raises — renamed or
extra keys can never be silently dropped.

Zero-egress note: the files themselves come from
``tools/export_ocr_sd.py`` run on a machine with modelscope installed.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple

import numpy as np

from marconet_tpu.models.convnext_ocr import OCRConfig

Array = np.ndarray
StateDict = Mapping[str, Array]


class ConversionError(RuntimeError):
    pass


class _Tracker:
    """State-dict accessor that records consumed keys for strictness."""

    def __init__(self, sd: StateDict):
        self.sd = dict(sd)
        self.consumed: set = set()

    def __contains__(self, key):
        return key in self.sd

    def get(self, key) -> Array:
        if key not in self.sd:
            raise ConversionError(f"missing key {key!r}")
        self.consumed.add(key)
        return np.asarray(self.sd[key], np.float32)

    def assert_all_consumed(self, ignore: Sequence[str] = ()):
        """Raise if any key was neither consumed nor ignored-by-design.

        ``ignore``: regex patterns for keys that are intentionally not
        mapped (buffers we recompute, dead heads, bookkeeping).
        """
        pats = [re.compile(p) for p in ignore]
        left = [k for k in self.sd
                if k not in self.consumed
                and not any(p.search(k) for p in pats)]
        if left:
            raise ConversionError(
                f"{len(left)} unmapped state-dict keys (renamed or extra "
                f"layers?): {sorted(left)[:10]}")


def _t_linear(w: Array) -> Array:
    return np.ascontiguousarray(w.T)


def _t_conv(w: Array) -> Array:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _ln(t: _Tracker, prefix: str) -> Dict[str, Array]:
    return {"scale": t.get(f"{prefix}.weight"),
            "bias": t.get(f"{prefix}.bias")}


def _dense(t: _Tracker, prefix: str) -> Dict[str, Array]:
    return {"kernel": _t_linear(t.get(f"{prefix}.weight")),
            "bias": t.get(f"{prefix}.bias")}


# ---------------------------------------------------------------------------
# ModelScope ConvNextViT
# ---------------------------------------------------------------------------


def _find_prefix(sd: StateDict, marker: str) -> str:
    """Uniform prefix in front of ``marker`` (e.g. 'recognizer.')."""
    cands = {k[: k.index(marker)] for k in sd if marker in k}
    if not cands:
        raise ConversionError(f"no key contains {marker!r}; keys look "
                              f"like: {sorted(sd)[:5]}")
    if len(cands) > 1:
        raise ConversionError(f"ambiguous prefixes for {marker!r}: "
                              f"{sorted(cands)}")
    return cands.pop()


def convert_modelscope_ocr(sd: StateDict, num_heads: Optional[int] = None
                           ) -> Tuple[Dict[str, Any], OCRConfig]:
    """ModelScope ConvNextViT state dict -> (variables, OCRConfig).

    ``num_heads``: the true attention head count (exported by
    ``tools/export_ocr_sd.py`` into the manifest's ``__meta__``); when
    absent, falls back to the timm 64-wide-head convention.
    """
    t = _Tracker(sd)
    cp = _find_prefix(sd, "downsample_layers")
    vp = _find_prefix(sd, "blocks.0.norm1")

    # ---- ConvNeXt trunk ---------------------------------------------------
    cnn: Dict[str, Any] = {}
    stem_w = t.get(f"{cp}downsample_layers.0.0.weight")
    cnn["stem_conv"] = {"kernel": _t_conv(stem_w),
                        "bias": t.get(f"{cp}downsample_layers.0.0.bias")}
    cnn["stem_norm"] = _ln(t, f"{cp}downsample_layers.0.1")
    dims: List[int] = [stem_w.shape[0]]
    si = 1
    while f"{cp}downsample_layers.{si}.1.weight" in t:
        cnn[f"down_norm{si}"] = _ln(t, f"{cp}downsample_layers.{si}.0")
        w = t.get(f"{cp}downsample_layers.{si}.1.weight")
        cnn[f"down_conv{si}"] = {
            "kernel": _t_conv(w),
            "bias": t.get(f"{cp}downsample_layers.{si}.1.bias")}
        dims.append(w.shape[0])
        si += 1

    depths: List[int] = []
    for s in range(len(dims)):
        bi = 0
        while f"{cp}stages.{s}.{bi}.dwconv.weight" in t:
            blk = {
                "dw_kernel": _t_conv(
                    t.get(f"{cp}stages.{s}.{bi}.dwconv.weight")),
                "dw_bias": t.get(f"{cp}stages.{s}.{bi}.dwconv.bias"),
                "norm": _ln(t, f"{cp}stages.{s}.{bi}.norm"),
                "pw1": _dense(t, f"{cp}stages.{s}.{bi}.pwconv1"),
                "pw2": _dense(t, f"{cp}stages.{s}.{bi}.pwconv2"),
            }
            if f"{cp}stages.{s}.{bi}.gamma" in t:
                blk["gamma"] = t.get(f"{cp}stages.{s}.{bi}.gamma")
            cnn[f"stage{s}_{bi}"] = blk
            bi += 1
        if bi == 0:
            raise ConversionError(f"stage {s} has no blocks")
        depths.append(bi)
    layer_scale = 1e-6 if "gamma" in cnn["stage0_0"] else 0.0

    params: Dict[str, Any] = {"cnn": cnn}

    cnn_final_norm = f"{cp}norm.weight" in t and cp != vp
    if cnn_final_norm:
        params["cnn_norm"] = _ln(t, f"{cp}norm")

    # ---- ViT encoder --------------------------------------------------------
    pos = t.get(f"{vp}pos_embed")
    use_cls = f"{vp}cls_token" in t
    if use_cls:
        params["cls_token"] = t.get(f"{vp}cls_token")
    params["pos_embed"] = pos.reshape(1, pos.shape[-2], pos.shape[-1])

    use_proj = f"{vp}patch_embed.proj.weight" in t
    vit_dim = pos.shape[-1]
    if use_proj:
        w = t.get(f"{vp}patch_embed.proj.weight")
        if w.ndim == 4:  # 1x1 (or kxk) conv projection -> dense over C
            if w.shape[2] * w.shape[3] != 1:
                raise ConversionError(
                    f"patch_embed.proj kernel {w.shape} is spatial; the "
                    "CNN-fed ViT expects a pointwise projection")
            w = w[:, :, 0, 0]
        params["vit_proj"] = {
            "kernel": _t_linear(w),
            "bias": t.get(f"{vp}patch_embed.proj.bias")}

    depth = 0
    while f"{vp}blocks.{depth}.norm1.weight" in t:
        b = f"{vp}blocks.{depth}"
        params[f"block{depth}"] = {
            "norm1": _ln(t, f"{b}.norm1"),
            "qkv": _dense(t, f"{b}.attn.qkv"),
            "proj": _dense(t, f"{b}.attn.proj"),
            "norm2": _ln(t, f"{b}.norm2"),
            "mlp1": _dense(t, f"{b}.mlp.fc1"),
            "mlp2": _dense(t, f"{b}.mlp.fc2"),
        }
        depth += 1
    if depth == 0:
        raise ConversionError("no ViT blocks found")
    params["norm"] = _ln(t, f"{vp}norm")
    head_w = t.get(f"{vp}head.weight")
    params["head"] = {"kernel": _t_linear(head_w),
                      "bias": t.get(f"{vp}head.bias")}

    mlp_hidden = params["block0"]["mlp1"]["kernel"].shape[1]
    cfg = OCRConfig(
        depths=tuple(depths), dims=tuple(dims),
        vit_depth=depth, vit_dim=vit_dim,
        # head count is NOT recoverable from tensor shapes, and attention
        # output DOES depend on it (softmax is per-head): a checkpoint
        # trained with a different count would produce wrong logits.
        # Prefer the true count from the export manifest's __meta__;
        # fall back to the timm 64-wide-head convention.
        vit_heads=num_heads if num_heads else max(1, vit_dim // 64),
        vit_mlp_ratio=mlp_hidden / vit_dim,
        num_classes=head_w.shape[0],
        blank_index=0,
        use_cls_token=use_cls,
        use_vit_proj=use_proj,
        cnn_final_norm=cnn_final_norm,
        layer_scale_init=layer_scale,
        # canonical sequence length: the checkpoint's pos_embed is fixed
        # at this many tokens; ConvNextViT interpolates it for other
        # segment widths (see models.convnext_ocr.resize_pos_embed)
        seq_len=pos.shape[-2],
    )
    t.assert_all_consumed(ignore=(
        r"num_batches_tracked",
        r"(^|\.)head_dist\.",        # DeiT distillation head (unused)
        r"(^|\.)dist_token$",
    ))
    return {"params": params}, cfg


def load_vocab(path: str) -> str:
    """ModelScope ``vocab.txt`` -> charset string (one char per line)."""
    chars = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if line:
                chars.append(line[0] if len(line) > 1 else line)
    return "".join(chars)


def load_ocr_checkpoint(path: str) -> Tuple[Dict[str, Any], OCRConfig]:
    """Load an exported ModelScope OCR state dict (.pth/.pt file).

    Only plain tensor state dicts are accepted (``weights_only=True``).
    Arbitrary-pickle checkpoints are refused unless the user explicitly
    opts in with ``MARCONET_UNSAFE_TORCH_LOAD=1`` — a passively
    discovered third-party file must never execute pickle code silently.

    A ``ocr_key_manifest.json`` next to the checkpoint (written by
    ``tools/export_ocr_sd.py``) supplies the true attention head count
    via its ``__meta__.num_heads`` entry.
    """
    import json
    import os

    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:
        if os.environ.get("MARCONET_UNSAFE_TORCH_LOAD") == "1":
            ckpt = torch.load(path, map_location="cpu", weights_only=False)
        else:
            raise ConversionError(
                f"{path} is not a plain tensor state dict "
                f"(weights_only load failed: {e}). Re-export it with "
                "tools/export_ocr_sd.py, or set "
                "MARCONET_UNSAFE_TORCH_LOAD=1 to allow unpickling a "
                "file you trust.") from e
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    sd = {k: np.asarray(v.detach() if hasattr(v, "detach") else v,
                        np.float32)
          for k, v in ckpt.items()}

    num_heads = None
    manifest = os.path.join(os.path.dirname(path), "ocr_key_manifest.json")
    if os.path.exists(manifest):
        with open(manifest, encoding="utf-8") as f:
            meta = json.load(f).get("__meta__", {})
        num_heads = meta.get("num_heads")
    return convert_modelscope_ocr(sd, num_heads=num_heads)


# ---------------------------------------------------------------------------
# Legacy TransformerOCR (reference models/ocr.py:310-370)
# ---------------------------------------------------------------------------


def _bn(t: _Tracker, prefix: str) -> Tuple[Dict, Dict]:
    params = {"scale": t.get(f"{prefix}.weight"),
              "bias": t.get(f"{prefix}.bias")}
    stats = {"mean": t.get(f"{prefix}.running_mean"),
             "var": t.get(f"{prefix}.running_var")}
    return params, stats


def _conv(t: _Tracker, prefix: str) -> Dict[str, Array]:
    return {"kernel": _t_conv(t.get(f"{prefix}.weight")),
            "bias": t.get(f"{prefix}.bias")}


def _mha(t: _Tracker, prefix: str) -> Dict[str, Any]:
    """torch ``linears.{0..3}`` -> q/k/v/out Dense params."""
    names = ("q", "k", "v", "out")
    return {n: _dense(t, f"{prefix}.linears.{i}")
            for i, n in enumerate(names)}


def _addnorm(t: _Tracker, prefix: str) -> Dict[str, Array]:
    return {"scale": t.get(f"{prefix}.a_2"),
            "bias": t.get(f"{prefix}.b_2")}


def convert_legacy_ocr(sd: StateDict) -> Dict[str, Any]:
    """``TransformerOCR`` state dict -> LegacyTransformerOCR variables.

    Handles both released layouts: ``net_real_world_ocr.pth`` and
    ``net_new_bbox.pth`` (the latter adds ``generator_loc``, exposed as
    the optional ``loc_head``).
    """
    t = _Tracker(sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["embedding"] = {"embedding": t.get("embedding_word.lut.weight")}

    # ---- conv encoder -------------------------------------------------------
    enc_p: Dict[str, Any] = {}
    enc_s: Dict[str, Any] = {}
    for name, tk in (("conv1", "encoder.conv1"), ("conv2", "encoder.conv2")):
        enc_p[name] = _conv(t, tk)
    for name, tk in (("bn1", "encoder.bn1"), ("bn2", "encoder.bn2")):
        enc_p[name], enc_s[name] = _bn(t, tk)

    plan = ((1, 3), (2, 4), (3, 6), (4, 3))
    for li, blocks in plan:
        for bi in range(blocks):
            base = f"encoder.layer{li}.{bi}"
            bp: Dict[str, Any] = {"conv1": _conv(t, f"{base}.conv1"),
                                  "conv2": _conv(t, f"{base}.conv2")}
            bs: Dict[str, Any] = {}
            bp["bn1"], bs["bn1"] = _bn(t, f"{base}.bn1")
            bp["bn2"], bs["bn2"] = _bn(t, f"{base}.bn2")
            if f"{base}.downsample.0.weight" in t:
                bp["down_conv"] = _conv(t, f"{base}.downsample.0")
                bp["down_bn"], bs["down_bn"] = _bn(t,
                                                   f"{base}.downsample.1")
            enc_p[f"layer{li}_{bi}"] = bp
            enc_s[f"layer{li}_{bi}"] = bs
        if li < 4:
            enc_p[f"layer{li}_conv"] = _conv(t, f"encoder.layer{li}_conv")
            enc_p[f"layer{li}_bn"], enc_s[f"layer{li}_bn"] = _bn(
                t, f"encoder.layer{li}_bn")
    enc_p["out_conv"] = _conv(t, "encoder.layer4_conv2")
    enc_p["out_bn"], enc_s["out_bn"] = _bn(t, "encoder.layer4_conv2_bn")
    params["encoder"] = enc_p
    stats["encoder"] = enc_s

    # ---- decoder ------------------------------------------------------------
    params["decoder"] = {
        "self_attn": _mha(t, "decoder.mask_multihead"),
        "norm1": _addnorm(t, "decoder.mul_layernorm1"),
        "cross_attn": _mha(t, "decoder.multihead"),
        "norm2": _addnorm(t, "decoder.mul_layernorm2"),
        "ff1": _dense(t, "decoder.pff.w_1"),
        "ff2": _dense(t, "decoder.pff.w_2"),
        "norm3": _addnorm(t, "decoder.mul_layernorm3"),
    }
    params["generator"] = _dense(t, "generator_word.proj")
    if "generator_loc.proj.weight" in t:
        params["loc_head"] = _dense(t, "generator_loc.proj")

    t.assert_all_consumed(ignore=(
        r"num_batches_tracked",
        r"^pe\.pe$",                               # recomputed buffer
        r"compress_attention_linear",              # dead torch submodule
    ))
    return {"params": params, "batch_stats": stats}
