"""Differentiable JPEG (compress -> decompress) in JAX.

JAX re-implementation of the reference's torch DiffJPEG
(``Train/util/diffjpeg.py:49-491``): RGB->YCbCr, 2x2 chroma average-pool
subsampling, 8x8 block DCT, quality-scaled quantization with the standard
luma/chroma tables, optional differentiable rounding
(``round(x) + (x - round(x))^3``), inverse chain with nearest chroma
upsampling, and pad-to-16 handling. Batched NHWC, jit-able, usable both
on-device (differentiable augmentation) and from numpy data workers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# standard JPEG quantization tables
_Y_TABLE = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], np.float32).T  # stored transposed — torch DiffJPEG convention, kept
# for bit-parity with the reference (Train/util/diffjpeg.py y_table)

_C_TABLE = np.full((8, 8), 99, np.float32)
_C_TABLE[:4, :4] = np.array([
    [17, 18, 24, 47],
    [18, 21, 26, 66],
    [24, 26, 56, 99],
    [47, 66, 99, 99]], np.float32)

_RGB2YCC = np.array([
    [0.299, 0.587, 0.114],
    [-0.168736, -0.331264, 0.5],
    [0.5, -0.418688, -0.081312]], np.float32).T
_YCC_SHIFT = np.array([0.0, 128.0, 128.0], np.float32)

_YCC2RGB = np.array([
    [1.0, 0.0, 1.402],
    [1.0, -0.344136, -0.714136],
    [1.0, 1.772, 0.0]], np.float32).T


def _dct_matrix() -> np.ndarray:
    d = np.zeros((8, 8), np.float32)
    for u in range(8):
        a = np.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            d[u, x] = 0.5 * a * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return d


_DCT = _dct_matrix()


def quality_to_factor(quality):
    """JPEG quality in (0,100] -> quantization scale factor."""
    quality = jnp.asarray(quality, jnp.float32)
    return jnp.where(quality < 50.0, 5000.0 / quality,
                     200.0 - 2.0 * quality) / 100.0


def _round(x, differentiable: bool):
    if differentiable:
        r = jnp.round(x)
        return r + (x - r) ** 3
    return jnp.round(x)


def _blockify(ch):
    """(B, H, W) -> (B, nblocks, 8, 8)."""
    b, h, w = ch.shape
    x = ch.reshape(b, h // 8, 8, w // 8, 8)
    return x.transpose(0, 1, 3, 2, 4).reshape(b, -1, 8, 8)


def _unblockify(blocks, h, w):
    b = blocks.shape[0]
    x = blocks.reshape(b, h // 8, w // 8, 8, 8)
    return x.transpose(0, 1, 3, 2, 4).reshape(b, h, w)


def _channel_pass(ch, table, factor, differentiable):
    """DCT -> quantize -> dequantize -> IDCT on one (B, H, W) plane."""
    h, w = ch.shape[1:]
    d = jnp.asarray(_DCT)
    blocks = _blockify(ch) - 128.0
    coef = jnp.einsum("ux,bnxy,vy->bnuv", d, blocks, d)
    q = table[None, None] * factor[:, None, None, None]
    coef = _round(coef / q, differentiable) * q
    rec = jnp.einsum("ux,bnuv,vy->bnxy", d, coef, d) + 128.0
    return _unblockify(rec, h, w)


@functools.partial(jax.jit, static_argnames=("differentiable",))
def _jpeg_core(x, factor, differentiable: bool):
    """x: (B, H16, W16, 3) in [0,1], H/W multiples of 16."""
    b, h, w, _ = x.shape
    ycc = (x * 255.0) @ jnp.asarray(_RGB2YCC) + jnp.asarray(_YCC_SHIFT)
    y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]

    def down(c):  # 2x2 average pool
        return c.reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4))

    def up(c):  # nearest 2x upsample
        return jnp.repeat(jnp.repeat(c, 2, axis=1), 2, axis=2)

    yt, ct = jnp.asarray(_Y_TABLE), jnp.asarray(_C_TABLE)
    y = _channel_pass(y, yt, factor, differentiable)
    cb = up(_channel_pass(down(cb), ct, factor, differentiable))
    cr = up(_channel_pass(down(cr), ct, factor, differentiable))

    ycc = jnp.stack([y, cb, cr], axis=-1) - jnp.asarray(_YCC_SHIFT)
    rgb = ycc @ jnp.asarray(_YCC2RGB) / 255.0
    return jnp.clip(rgb, 0.0, 1.0)


def diff_jpeg(x, quality, differentiable: bool = False):
    """JPEG round-trip.

    Args:
      x: (B, H, W, 3) NHWC float in [0,1].
      quality: scalar or (B,) quality factors in (0, 100].
      differentiable: use the cubic soft-rounding surrogate.
    """
    x = jnp.asarray(x, jnp.float32)
    b, h, w, _ = x.shape
    quality = jnp.broadcast_to(jnp.asarray(quality, jnp.float32), (b,))
    factor = quality_to_factor(quality)
    hp = (16 - h % 16) % 16
    wp = (16 - w % 16) % 16
    xp = jnp.pad(x, ((0, 0), (0, hp), (0, wp), (0, 0)))
    out = _jpeg_core(xp, factor, differentiable)
    return out[:, :h, :w, :]


def _channel_pass_np(ch, table, factor):
    h, w = ch.shape
    d = _DCT
    x = ch.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3) - 128.0
    coef = np.einsum("ux,nmxy,vy->nmuv", d, x, d)
    q = table * factor
    coef = np.round(coef / q) * q
    rec = np.einsum("ux,nmuv,vy->nmxy", d, coef, d) + 128.0
    return rec.transpose(0, 2, 1, 3).reshape(h, w)


def jpeg_np(img: np.ndarray, quality: float) -> np.ndarray:
    """Single-image pure-numpy JPEG round trip (data workers).

    Same math as ``diff_jpeg`` but with no tracing/compilation: image
    shapes vary per sample in the degradation pipelines, so a jitted
    version would recompile constantly and data workers must never touch
    the device runtime anyway.
    """
    h, w = img.shape[:2]
    hp, wp = (16 - h % 16) % 16, (16 - w % 16) % 16
    x = np.pad(img.astype(np.float32), ((0, hp), (0, wp), (0, 0)))
    q = float(quality)
    factor = ((5000.0 / q) if q < 50.0 else (200.0 - 2.0 * q)) / 100.0

    ycc = (x * 255.0) @ _RGB2YCC + _YCC_SHIFT
    y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
    hh, ww = y.shape

    def down(c):
        return c.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))

    def up(c):
        return np.repeat(np.repeat(c, 2, axis=0), 2, axis=1)

    y = _channel_pass_np(y, _Y_TABLE, factor)
    cb = up(_channel_pass_np(down(cb), _C_TABLE, factor))
    cr = up(_channel_pass_np(down(cr), _C_TABLE, factor))
    out = (np.stack([y, cb, cr], -1) - _YCC_SHIFT) @ _YCC2RGB / 255.0
    return np.clip(out, 0.0, 1.0)[:h, :w].astype(np.float32)
