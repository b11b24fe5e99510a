"""Expected ultralytics yolo11m (nc=1) state-dict key/shape spec.

Used to validate the checkpoint converter's key mapping and shape
handling without the released weights file.
"""

from typing import Dict, Tuple

Shape = Tuple[int, ...]


def _conv(spec, prefix, cin, cout, k, groups=1):
    spec[f"{prefix}.conv.weight"] = (cout, cin // groups, k, k)
    for suffix in ("weight", "bias", "running_mean", "running_var"):
        spec[f"{prefix}.bn.{suffix}"] = (cout,)


def _bottleneck(spec, prefix, c, e, k=3):
    h = int(c * e)
    _conv(spec, f"{prefix}.cv1", c, h, k)
    _conv(spec, f"{prefix}.cv2", h, c, k)


def _c3k(spec, prefix, c):
    h = c // 2
    _conv(spec, f"{prefix}.cv1", c, h, 1)
    _conv(spec, f"{prefix}.cv2", c, h, 1)
    for i in range(2):
        _bottleneck(spec, f"{prefix}.m.{i}", h, 1.0)
    _conv(spec, f"{prefix}.cv3", c, c, 1)


def _c3k2(spec, prefix, cin, cout, e, c3k):
    c_ = int(cout * e)
    _conv(spec, f"{prefix}.cv1", cin, 2 * c_, 1)
    if c3k:
        _c3k(spec, f"{prefix}.m.0", c_)
    else:
        _bottleneck(spec, f"{prefix}.m.0", c_, 0.5)
    _conv(spec, f"{prefix}.cv2", 3 * c_, cout, 1)


def ultralytics_state_spec() -> Dict[str, Shape]:
    s: Dict[str, Shape] = {}
    _conv(s, "model.0", 3, 64, 3)
    _conv(s, "model.1", 64, 128, 3)
    _c3k2(s, "model.2", 128, 256, 0.25, False)
    _conv(s, "model.3", 256, 256, 3)
    _c3k2(s, "model.4", 256, 512, 0.25, False)
    _conv(s, "model.5", 512, 512, 3)
    _c3k2(s, "model.6", 512, 512, 0.5, True)
    _conv(s, "model.7", 512, 512, 3)
    _c3k2(s, "model.8", 512, 512, 0.5, True)
    # SPPF
    _conv(s, "model.9.cv1", 512, 256, 1)
    _conv(s, "model.9.cv2", 1024, 512, 1)
    # C2PSA
    _conv(s, "model.10.cv1", 512, 512, 1)
    _conv(s, "model.10.cv2", 512, 512, 1)
    c_ = 256
    _conv(s, "model.10.m.0.attn.qkv", c_, 2 * c_, 1)
    _conv(s, "model.10.m.0.attn.proj", c_, c_, 1)
    _conv(s, "model.10.m.0.attn.pe", c_, c_, 3, groups=c_)
    _conv(s, "model.10.m.0.ffn.0", c_, 2 * c_, 1)
    _conv(s, "model.10.m.0.ffn.1", 2 * c_, c_, 1)
    # head
    _c3k2(s, "model.13", 1024, 512, 0.5, False)
    _c3k2(s, "model.16", 1024, 256, 0.5, False)
    _conv(s, "model.17", 256, 256, 3)
    _c3k2(s, "model.19", 768, 512, 0.5, False)
    _conv(s, "model.20", 512, 512, 3)
    _c3k2(s, "model.22", 1024, 512, 0.5, True)
    # detect (nc=1, ch=(256, 512, 512))
    c2, c3 = 64, 256
    for i, ch in enumerate((256, 512, 512)):
        _conv(s, f"model.23.cv2.{i}.0", ch, c2, 3)
        _conv(s, f"model.23.cv2.{i}.1", c2, c2, 3)
        s[f"model.23.cv2.{i}.2.weight"] = (64, c2, 1, 1)
        s[f"model.23.cv2.{i}.2.bias"] = (64,)
        _conv(s, f"model.23.cv3.{i}.0.0", ch, ch, 3, groups=ch)
        _conv(s, f"model.23.cv3.{i}.0.1", ch, c3, 1)
        _conv(s, f"model.23.cv3.{i}.1.0", c3, c3, 3, groups=c3)
        _conv(s, f"model.23.cv3.{i}.1.1", c3, c3, 1)
        s[f"model.23.cv3.{i}.2.weight"] = (1, c3, 1, 1)
        s[f"model.23.cv3.{i}.2.bias"] = (1,)
    return s
