"""Width-folded conv layout for low-channel stages.

The encoder's early ResNet stages run 3/32/64-channel convs at 32x512 /
16x512 — with channels far below the TPU's 128-wide lane dimension,
every tensor is lane-padded and the convs run at 1-17% MXU
(``tools/bench_encoder_parts.py``). Because the model is NHWC
channels-minor, folding the width axis into channels is a FREE reshape:
``(B, H, W, C) -> (B, H, W/f, f*C)`` splits W contiguously — no
transpose, no data movement. In the folded layout a hi-res conv becomes
an ``f*C``-channel conv whose kernel is derived at trace time from the
stored hi-res kernel (a few-KB scatter, constant relative to the conv),
so parameters, checkpoints and converters are untouched.

This is the 1-D width-only sibling of the 2x2 subpixel phase layout the
SR tail uses (``ops/phase.py``); unlike that layout no pack/unpack
transposes are ever needed.

Exactness: the folded kernel places each hi-res tap ``(ky, dx)`` at
folded tap ``(ky, dj)`` / input channel block ``s`` with
``q + dx = f*dj + s`` for output phase ``q`` — every hi-res MAC appears
exactly once, the extra kernel entries are zeros, and folded zero-SAME
padding reads exactly the hi-res zero padding (verified in
``tests/test_ops.py::TestWidthFold``). Height strides pass through
(width strides would change the fold and are rejected).

Parity target: this computes the reference's plain torch convs
(``models/resnet.py:9-29``) exactly, in a TPU-native layout.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def wfold(x: jax.Array, f: int) -> jax.Array:
    """(B, H, W, C) -> (B, H, W/f, f*C); free reshape (channels-minor)."""
    b, h, w, c = x.shape
    assert w % f == 0, (w, f)
    return x.reshape(b, h, w // f, f * c)


def wunfold(x: jax.Array, f: int) -> jax.Array:
    """(B, H, W', f*C) -> (B, H, W'*f, C); free reshape."""
    b, h, w, fc = x.shape
    assert fc % f == 0, (fc, f)
    return x.reshape(b, h, w * f, fc // f)


def wfold_kernel(k: jax.Array, f: int) -> Tuple[jax.Array, Tuple[int, int]]:
    """(kh, kw, I, O) hi-res kernel -> ((kh, kw', f*I, f*O), width pad).

    Output channel block ``q`` holds hi-res column phase ``q``; input
    blocks likewise. Hi-res tap ``dx`` (centered, odd ``kw``) applied at
    output column ``f*j + q`` reads column ``f*j + q + dx`` = phase
    ``s = (q+dx) % f`` of folded column ``j + dj``, ``dj = (q+dx-s)//f``.
    Returns the folded kernel and the zero-SAME width padding
    ``(-dj_min, dj_max)`` that reproduces the hi-res zero padding.
    """
    kh, kw, ci, co = k.shape
    assert kw % 2 == 1, "width-fold expects centered odd-width kernels"
    r = kw // 2
    dj_min = (0 - r) // f          # most negative folded offset (q=0)
    dj_max = (f - 1 + r) // f      # most positive (q=f-1)
    kwf = dj_max - dj_min + 1
    kf = jnp.zeros((kh, kwf, f * ci, f * co), k.dtype)
    for q in range(f):
        for dx in range(-r, r + 1):
            s = (q + dx) % f
            dj = (q + dx - s) // f
            kf = kf.at[:, dj - dj_min,
                       s * ci:(s + 1) * ci,
                       q * co:(q + 1) * co].add(k[:, dx + r])
    return kf, (-dj_min, dj_max)


def phase_to_wfold(x: jax.Array) -> jax.Array:
    """(B, H, W, 4C) 2x2 phase-packed -> (B, 2H, W, 2C) width-folded.

    Phase blocks are ordered ``2p+q`` (``ops/phase.phase_pack``): hi-res
    ``y[2i+p, 2j+q] == x[i, j, (2p+q)C + c]``. Splitting the channel axis
    as ``(p, q*C+c)`` and interleaving ``p`` into rows yields exactly the
    wfold-2 layout (row ``2i+p``, column block ``q``) in ONE transpose —
    the entry relayout from the phase-emitting fused upsample-conv
    (``final_b``) into the width-folded tail.
    """
    b, h, w, c4 = x.shape
    c = c4 // 4
    y = x.reshape(b, h, w, 2, 2 * c)
    return y.transpose(0, 1, 3, 2, 4).reshape(b, 2 * h, w, 2 * c)


def upconv_wfold_kernel(k3: jax.Array) -> jax.Array:
    """(3,3,I,O) -> (6,3,I,2O) kernel emitting wfold-2 output directly.

    ``conv3x3(zero-SAME, upsample2x_bilinear(x))`` with the output
    width-folded (hi-res column phase ``q`` in channel block ``q``) and
    the output ROW dimension real — computed as ONE lhs-H-dilated conv,
    so no phase->wfold relayout transpose is ever needed (the entry
    relayout cost ~7 ms standalone and ate the folded tail's win;
    probe: ``tools/probe_tail_entry.py``).

    Derivation: with the input H-dilated by 2 (``x[i]`` at dilated row
    ``2i``) and left row padding 3, output row ``Y = 2i+p`` reads
    ``x[i+di]`` through kernel row ``kr = 3 - p + 2*di`` — row phase
    ``p`` lands on alternating taps. Each (kr, q) tap holds the
    composed upsample+conv phase kernel ``K_pq``
    (``ops/phase.upconv_phase_kernel``); width taps are plain over the
    low-res columns.
    """
    from marconet_tpu.ops.phase import upconv_phase_kernel

    k4 = upconv_phase_kernel(k3)  # (3,3,I,4O), blocks ordered 2p+q
    ci, co = k3.shape[2], k3.shape[3]
    k6 = jnp.zeros((6, 3, ci, 2 * co), k3.dtype)
    for p in (0, 1):
        for di in (-1, 0, 1):
            kr = 3 - p + 2 * di
            for q in (0, 1):
                k6 = k6.at[kr, :, :, q * co:(q + 1) * co].add(
                    k4[di + 1, :, :, (2 * p + q) * co:(2 * p + q + 1) * co])
    return k6


def conv3x3_after_upsample2x_wfold(x: jax.Array, k3: jax.Array) -> jax.Array:
    """Exactly ``wfold(conv3x3(zero-SAME, upsample2x_bilinear(x)), 2)``.

    x: (B, H, W, I) plain low-res; returns (B, 2H, W, 2O) width-folded
    hi-res. One lhs-H-dilated conv on the edge-padded input (the edge
    pad implements the bilinear border clamp), then the four 1-px
    hi-res borders are patched from the exact separate-path strips
    (``resize.border_strips``) with fused pad+where selects — top/bot
    are one folded row, left is (folded col 0, block 0), right is
    (folded col W-1, block 1); left/right applied last own the corners
    (same convention as the dense and phase forms).
    """
    from marconet_tpu.ops.resize import border_strips

    b, h, w, _ = x.shape
    co = k3.shape[-1]
    k6 = upconv_wfold_kernel(k3.astype(x.dtype))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    # padded rows i' = i+1: wanted output rows Y' = 2i'+p span 2..2h+1
    # of the length-(2h+2) conv output ((2(h+2)-1) + 3 + 1 - 6 + 1)
    out = jax.lax.conv_general_dilated(
        xp, k6, (1, 1), ((3, 1), (0, 0)), lhs_dilation=(2, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = jax.lax.slice_in_dim(out, 2, 2 + 2 * h, axis=1)

    top, bot, left, right = border_strips(x, k3.astype(x.dtype))
    ri = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * h, 1, 1), 1)
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w, 1), 2)
    ch = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 2 * co), 3)
    # top/bottom hi-res rows: (B,1,2W,O) reshapes straight to folded
    vt = jnp.pad(top.reshape(b, 1, w, 2 * co),
                 ((0, 0), (0, 2 * h - 1), (0, 0), (0, 0)))
    out = jnp.where(ri == 0, vt, out)
    vb = jnp.pad(bot.reshape(b, 1, w, 2 * co),
                 ((0, 0), (2 * h - 1, 0), (0, 0), (0, 0)))
    out = jnp.where(ri == 2 * h - 1, vb, out)
    # left hi-res col 0 = (folded col 0, block q=0); right = (W-1, q=1)
    vl = jnp.pad(left, ((0, 0), (0, 0), (0, w - 1), (0, co)))
    out = jnp.where((ci == 0) & (ch < co), vl, out)
    vr = jnp.pad(right, ((0, 0), (0, 0), (w - 1, 0), (co, 0)))
    out = jnp.where((ci == w - 1) & (ch >= co), vr, out)
    return out


def wfold_group_norm(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                     num_groups: int, eps: float = 1e-6,
                     f: int = 2) -> jax.Array:
    """GroupNorm of the *hi-res* tensor, computed in width-folded layout.

    Statistics for a channel group pool the group's channels across all
    ``f`` column-phase copies (they are the same hi-res channels; the
    fold only moved columns into channels). One reduction pass over the
    activations to per-(batch, folded-channel) sums, then the fold and
    the group's channels collapse on tiny (B, f*C) vectors. Mirrors
    ``ops/phase.phase_group_norm`` for the 1-D fold.

    x: (B, H, W', f*C) width-folded; gamma/beta: (C,) hi-res params.
    """
    b, h, w, cf = x.shape
    c = cf // f
    g = num_groups
    f32 = x.astype(jnp.float32)
    s1 = f32.sum(axis=(1, 2))                     # (B, fC)
    s2 = jnp.square(f32).sum(axis=(1, 2))
    n = float(f) * h * w * (c // g)
    gs1 = s1.reshape(b, f, g, c // g).sum(axis=(1, 3)) / n   # (B, g)
    gs2 = s2.reshape(b, f, g, c // g).sum(axis=(1, 3)) / n
    var = jnp.maximum(gs2 - jnp.square(gs1), 0.0)
    scale = jax.lax.rsqrt(var + eps)
    mean_c = jnp.tile(jnp.repeat(gs1, c // g, axis=1), (1, f))  # (B, fC)
    scl_c = jnp.tile(jnp.repeat(scale, c // g, axis=1), (1, f))
    y = (f32 - mean_c[:, None, None, :]) * scl_c[:, None, None, :]
    gamma_f = jnp.tile(gamma.astype(x.dtype), f)
    beta_f = jnp.tile(beta.astype(x.dtype), f)
    return y.astype(x.dtype) * gamma_f + beta_f


def wfold_conv(x: jax.Array, k: jax.Array, f: int,
               strides: Tuple[int, int] = (1, 1),
               bias: Optional[jax.Array] = None,
               pad_h: Optional[Tuple[int, int]] = None) -> jax.Array:
    """Hi-res conv computed in width-folded layout.

    ``wunfold(wfold_conv(wfold(y, f), k, f), f)`` equals the hi-res
    zero-SAME conv of ``y`` with ``k`` exactly (up to float
    reassociation). ``x``: (B, H, W', f*I); returns (B, H", W', f*O).
    Only height strides are supported (width strides change the fold).
    """
    assert strides[1] == 1, "width stride would change the fold"
    kh = k.shape[0]
    if pad_h is None:
        pad_h = (kh // 2, kh // 2)
    kf, pad_w = wfold_kernel(k.astype(x.dtype), f)
    y = jax.lax.conv_general_dilated(
        x, kf, strides, (pad_h, pad_w),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + jnp.tile(bias.astype(y.dtype), f)
    return y
