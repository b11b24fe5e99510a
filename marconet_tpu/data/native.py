"""ctypes bindings for the native data-path kernels (libtextdegrade.so).

Auto-builds the shared library on first use when a compiler is present;
every entry point has a numpy/scipy fallback so the pipeline works
without it. See ``native/textdegrade.cc``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtextdegrade.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("MARCONET_NATIVE", "1") == "0":
        return None  # forced numpy/scipy fallback (bench A/Bs)
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.conv2d_mirror.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int, f32p, ctypes.c_int,
                                      f32p]
        lib.jpeg_roundtrip.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                                       f32p, f32p]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def conv2d_mirror(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """Reflect-101 padded 2D convolution of (H, W, C) with (k, k)."""
    lib = _load()
    if lib is None:
        from scipy import ndimage

        return ndimage.convolve(img, kernel[..., None].astype(np.float32),
                                mode="mirror")
    img = np.ascontiguousarray(img, np.float32)
    kernel = np.ascontiguousarray(kernel, np.float32)
    out = np.empty_like(img)
    h, w, c = img.shape
    lib.conv2d_mirror(img, h, w, c, kernel, kernel.shape[0], out)
    return out


def jpeg_roundtrip(img: np.ndarray, quality: float) -> np.ndarray:
    """JPEG round trip of an (H, W, 3) RGB [0,1] image."""
    lib = _load()
    if lib is None:
        from marconet_tpu.data.degrade.diffjpeg import jpeg_np

        return jpeg_np(img, quality)
    from marconet_tpu.data.degrade.diffjpeg import _C_TABLE, _Y_TABLE

    h, w = img.shape[:2]
    hp, wp = (16 - h % 16) % 16, (16 - w % 16) % 16
    x = np.ascontiguousarray(
        np.pad(img.astype(np.float32), ((0, hp), (0, wp), (0, 0))))
    q = float(quality)
    factor = ((5000.0 / q) if q < 50.0 else (200.0 - 2.0 * q)) / 100.0
    yq = np.ascontiguousarray(_Y_TABLE * factor, np.float32)
    cq = np.ascontiguousarray(_C_TABLE * factor, np.float32)
    lib.jpeg_roundtrip(x, x.shape[0], x.shape[1], yq, cq)
    return x[:h, :w]
