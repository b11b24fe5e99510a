"""Phase-separated (2x2 subpixel) layout for the SR net's final chain.

The SR net's tail runs 64-128-channel 3x3 convs on the x2-upsampled
128 x 2048 canvas. Low-channel convs at large spatial are layout-bound on
TPU: measured 31% MXU for the final chain, insensitive to batch/width
reshapes (BENCH_NOTES.md). The same math is exactly expressible on the
half-resolution grid with the four 2x2 subpixel *phases* packed into
channels — 4C channels at H x W instead of C at 2H x 2W — where the convs
become 256-channel convs that tile well onto the MXU (measured: final_b
7.45 ms phase vs 12.77 ms composed; res convs 9.09 vs 12.57; final_out
7.32 vs 9.46; ``tools/probe_phase.py``).

Layout convention: a hi-res tensor ``y`` (B, 2H, 2W, C) is stored as
``x`` (B, H, W, 4C) with channel blocks ordered by phase index
``2*p + q`` for ``y[2i+p, 2j+q] == x[i, j, (2p+q)*C:(2p+q+1)*C]``.

Everything here is an exact re-bracketing of the reference math
(``models/networks.py:411-485`` tail); parameters keep their original
shapes — phase kernels are derived from the stored 3x3 kernels at trace
time (a few-KB einsum, constant relative to the conv itself).

Two kernel derivations:

* ``phase_conv3x3_kernels`` — a plain hi-res 3x3 stride-1 zero-SAME conv.
  Output phase p's row footprint on the low-res grid is 2 rows
  (``i-1..i`` for p=0, ``i..i+1`` for p=1), and both column phases fit a
  3-tap column window, so each row phase is one (2, 3) conv over all 4C
  input channels producing both column-phase blocks (2C channels). Zero
  row/col padding in phase layout corresponds exactly to the hi-res
  conv's zero padding, so no border corrections are needed.
* ``upconv_phase_kernel`` — ``conv3x3(zero-SAME, upsample2x_bilinear(x))``
  (the final_b composition, see ``ops/resize.py``). Each output phase has
  a full 3x3 low-res footprint: ``K[p,q] = A_p^T k3 A_q`` per channel
  pair, with ``A_p`` the 3x3 matrix folding the half-pixel bilinear taps
  (0.25/0.75) into the conv taps. Interior-exact on the edge-padded
  input; the four 1-px hi-res borders (where the conv's zero padding of
  the *intermediate* differs) are patched with the same exact strips the
  composed dense form uses (``resize.border_strips``).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

# Row-phase fold matrices: A_p[di+1, dy+1] = weight with which hi-res conv
# tap dy (applied at output row 2i+p) reads low-res row i+di through the
# half-pixel bilinear upsample up(2m) = .25 x[m-1] + .75 x[m],
# up(2m+1) = .75 x[m] + .25 x[m+1].
_A0 = np.array([[0.75, 0.25, 0.0],
                [0.25, 0.75, 0.75],
                [0.0, 0.0, 0.25]], np.float32)
_A1 = np.array([[0.25, 0.0, 0.0],
                [0.75, 0.75, 0.25],
                [0.0, 0.25, 0.75]], np.float32)


def phase_pack(y: jax.Array) -> jax.Array:
    """(B, 2H, 2W, C) hi-res -> (B, H, W, 4C) phase-packed (space-to-depth)."""
    b, h2, w2, c = y.shape
    h, w = h2 // 2, w2 // 2
    y = y.reshape(b, h, 2, w, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, 4 * c)


def phase_unpack(x: jax.Array) -> jax.Array:
    """(B, H, W, 4C) phase-packed -> (B, 2H, 2W, C) hi-res (depth-to-space)."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    y = x.reshape(b, h, w, 2, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)


def phase_conv3x3_kernels(k3: jax.Array):
    """(3,3,I,O) hi-res conv kernel -> two (2,3,4I,2O) phase-layout kernels.

    Returns ``(k_p0, k_p1)`` for output row phases 0 and 1. Input channel
    blocks are ordered ``2r+s`` (matching ``phase_pack``); output blocks
    are the two column phases ``q`` of the given row phase.

    Mapping: hi-res tap (dy, dx) applied at output (2i+p, 2j+q) reads
    hi-res (2i+p+dy, 2j+q+dx) = phase (r, s) of low-res (i+di, j+dj) with
    ``r = (p+dy) % 2, di = (p+dy-r)//2`` (same for columns). For p=0,
    di in {-1, 0} (kernel row = di+1, row padding (1, 0)); for p=1,
    di in {0, 1} (kernel row = di, row padding (0, 1)).
    """
    ci, co = k3.shape[2], k3.shape[3]
    kers = []
    for p in (0, 1):
        k = jnp.zeros((2, 3, 4 * ci, 2 * co), k3.dtype)
        for dy in (-1, 0, 1):
            r = (p + dy) % 2
            di = (p + dy - r) // 2
            ki = di + 1 if p == 0 else di
            for q in (0, 1):
                for dx in (-1, 0, 1):
                    s = (q + dx) % 2
                    dj = (q + dx - s) // 2
                    kj = dj + 1  # both column phases fit the 3-tap window
                    blk_in = 2 * r + s
                    k = k.at[ki, kj,
                             blk_in * ci:(blk_in + 1) * ci,
                             q * co:(q + 1) * co].add(k3[dy + 1, dx + 1])
        kers.append(k)
    return tuple(kers)


def phase_conv3x3_kernels_split4(k3: jax.Array):
    """(3,3,I,O) hi-res conv kernel -> four (2,2,4I,O) phase kernels.

    One kernel per output phase (p, q), ordered ``2p+q``. Output phase
    (p, q)'s low-res footprint is 2x2: row offsets ``di`` span {-1,0}
    for p=0 (row padding (1,0)) and {0,1} for p=1 (padding (0,1)), and
    likewise for columns — so each kernel is (2,2) over all 4I packed
    input channels. 9 of the 16 tap-slots are nonzero: 1.78x the hi-res
    MACs, vs 2.67x for the dense 2-conv form (``phase_conv3x3_kernels``)
    — while keeping 4I-channel-wide MXU contractions.
    """
    ci, co = k3.shape[2], k3.shape[3]
    kers = []
    for p in (0, 1):
        for q in (0, 1):
            k = jnp.zeros((2, 2, 4 * ci, co), k3.dtype)
            for dy in (-1, 0, 1):
                r = (p + dy) % 2
                di = (p + dy - r) // 2
                ki = di + 1 if p == 0 else di
                for dx in (-1, 0, 1):
                    s = (q + dx) % 2
                    dj = (q + dx - s) // 2
                    kj = dj + 1 if q == 0 else dj
                    blk = 2 * r + s
                    k = k.at[ki, kj, blk * ci:(blk + 1) * ci].add(
                        k3[dy + 1, dx + 1])
            kers.append(k)
    return tuple(kers)


def phase_conv3x3_kernel_embed9(k3: jax.Array) -> jax.Array:
    """(3,3,I,O) hi-res conv kernel -> ONE (3,3,4I,4O) phase kernel.

    Embeds each split4 (2,2,4I,O) kernel at row/col offset (p, q) of a
    3x3 kernel, so one plain SAME conv computes all four output phases
    at once: output phase p=0 needs low-res rows i-1..i (kernel rows
    0..1 under SAME padding) and p=1 rows i..i+1 (kernel rows 1..2) —
    the row shift is encoded in the kernel instead of asymmetric
    padding. 4x the hi-res MACs (vs dense2's 2.67x), but a single
    3x3 conv with 4I-wide contraction and one output buffer (no
    per-phase concat), which XLA:TPU lowers best at the tail shapes.
    """
    kers = phase_conv3x3_kernels_split4(k3)
    ci, co = k3.shape[2], k3.shape[3]
    k = jnp.zeros((3, 3, 4 * ci, 4 * co), k3.dtype)
    for idx, (p, q) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        k = k.at[p:p + 2, q:q + 2, :, idx * co:(idx + 1) * co].set(
            kers[idx])
    return k


def _phase_conv_form() -> str:
    """Phase-conv formulation: 'dense2' (two (2,3,4I,2O) convs),
    'split4' (four (2,2,4I,O) convs, 1.78x MACs), 'splitpad' (one
    (2,2,4I,4O) conv on the zero-padded input + shifted slices) or
    'embed9' (one plain (3,3,4I,4O) SAME conv, 4x MACs, no slicing).
    All exact; selected by measurement (BENCH_NOTES.md)."""
    return os.environ.get("MARCONET_PHASE_CONV", "dense2")


def phase_conv3x3(x: jax.Array, k3: jax.Array,
                  bias: jax.Array | None = None) -> jax.Array:
    """Hi-res 3x3 zero-SAME conv, computed entirely in phase layout.

    ``phase_unpack(phase_conv3x3(phase_pack(y), k3)) ==
    conv3x3_zero_same(y, k3)`` exactly (up to float reassociation).

    x: (B, H, W, 4I) phase-packed; returns (B, H, W, 4O) phase-packed.
    Formulation selected by ``MARCONET_PHASE_CONV`` (see
    ``_phase_conv_form``); all forms are exact re-bracketings.
    """
    form = _phase_conv_form()
    if form == "dense2":
        k_p0, k_p1 = phase_conv3x3_kernels(k3.astype(x.dtype))

        def conv(v, k, pad_h):
            return jax.lax.conv_general_dilated(
                v, k, (1, 1), (pad_h, (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        y0 = conv(x, k_p0, (1, 0))  # blocks (0,0), (0,1)
        y1 = conv(x, k_p1, (0, 1))  # blocks (1,0), (1,1)
        y = jnp.concatenate([y0, y1], axis=-1)
    elif form == "split4":
        kers = phase_conv3x3_kernels_split4(k3.astype(x.dtype))
        outs = []
        for idx, (p, q) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            outs.append(jax.lax.conv_general_dilated(
                x, kers[idx], (1, 1),
                ((1, 0) if p == 0 else (0, 1),
                 (1, 0) if q == 0 else (0, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
        y = jnp.concatenate(outs, axis=-1)
    elif form == "embed9":
        k9 = phase_conv3x3_kernel_embed9(k3.astype(x.dtype))
        y = jax.lax.conv_general_dilated(
            x, k9, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    elif form == "splitpad":
        # one VALID (2,2) conv on the 1-px zero-padded input computes all
        # four phases at shifted offsets: phase (p, q) of low-res (i, j)
        # reads padded rows i+p..i+p+1, cols j+q..j+q+1
        kers = phase_conv3x3_kernels_split4(k3.astype(x.dtype))
        co = k3.shape[3]
        kbig = jnp.concatenate(kers, axis=-1)  # (2,2,4I,4O)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        yy = jax.lax.conv_general_dilated(
            xp, kbig, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h, w = x.shape[1], x.shape[2]
        y = jnp.concatenate(
            [yy[:, p:p + h, q:q + w,
                (2 * p + q) * co:(2 * p + q + 1) * co]
             for p, q in ((0, 0), (0, 1), (1, 0), (1, 1))], axis=-1)
    else:  # pragma: no cover
        raise ValueError(f"unknown MARCONET_PHASE_CONV form: {form!r}")
    if bias is not None:
        y = y + jnp.tile(bias.astype(y.dtype), 4)
    return y


def upconv_phase_kernel(k3: jax.Array) -> jax.Array:
    """(3,3,I,O) -> (3,3,I,4O) phase kernel for conv3x3(upsample2x(x)).

    ``K[:, :, :, (2p+q)*O + o] = A_p^T @ k3[:, :, i, o] @ A_q`` — the
    exact low-res footprint of hi-res output phase (p, q) through the
    bilinear x2 upsample. Interior-exact; borders need the strip patches
    (see ``conv3x3_after_upsample2x_phase``).
    """
    a0 = jnp.asarray(_A0, k3.dtype)
    a1 = jnp.asarray(_A1, k3.dtype)
    blocks = []
    for ap in (a0, a1):
        for aq in (a0, a1):
            # K_pq[di,dj,i,o] = sum_{dy,dx} ap[di,dy] aq[dj,dx] k3[dy,dx,i,o]
            blocks.append(jnp.einsum("ad,be,deio->abio", ap, aq, k3))
    return jnp.concatenate(blocks, axis=-1)


def conv3x3_after_upsample2x_phase(x: jax.Array, k3: jax.Array,
                                   ) -> jax.Array:
    """Exactly ``phase_pack(conv3x3(zero-SAME, upsample2x_bilinear(x)))``.

    One 3x3 conv over the edge-padded low-res input (the edge pad
    implements the bilinear border clamp), with the four 1-px hi-res
    borders patched from the exact separate-path strips — the same
    corrections ``ops/resize.conv3x3_after_upsample2x`` applies to its
    dense hi-res form, scattered into phase layout here.

    x: (B, H, W, I) plain low-res; returns (B, H, W, 4O) phase-packed.
    """
    from marconet_tpu.ops.resize import border_strips

    co = k3.shape[-1]
    k4 = upconv_phase_kernel(k3.astype(x.dtype))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    out = jax.lax.conv_general_dilated(
        xp, k4, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (B, H, W, 4O)

    top, bot, left, right = border_strips(x, k3.astype(x.dtype))
    b, h, w, _ = out.shape
    # Patch the borders with fused pad+select passes — chained
    # ``.at[].set()`` updates materialize a full-size copy of the output
    # per patch on TPU (see ``resize.conv3x3_after_upsample2x``); these
    # wheres fuse into one elementwise pass. left/right are applied last
    # and own the corners.
    ri = jax.lax.broadcasted_iota(jnp.int32, (1, h, 1, 1), 1)
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w, 1), 2)
    ch = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 4 * co), 3)
    zc = jnp.zeros_like(left.reshape(b, h, 2, co)[:, :, :1])
    # top (B,1,2W,O): hi row 0 = phase p=0 -> channel blocks (0,0),(0,1)
    vt = jnp.pad(top.reshape(b, 1, w, 2 * co),
                 ((0, 0), (0, h - 1), (0, 0), (0, 2 * co)))
    out = jnp.where((ri == 0) & (ch < 2 * co), vt, out)
    # bottom (B,1,2W,O): hi row 2H-1 = p=1 row H-1 -> blocks (1,0),(1,1)
    vb = jnp.pad(bot.reshape(b, 1, w, 2 * co),
                 ((0, 0), (h - 1, 0), (0, 0), (2 * co, 0)))
    out = jnp.where((ri == h - 1) & (ch >= 2 * co), vb, out)
    # left (B,2H,1,O): hi col 0 = q=0 col 0 -> blocks (0,0) and (2)
    lcol = left.reshape(b, h, 2, co)
    vl = jnp.pad(
        jnp.concatenate([lcol[:, :, :1], zc, lcol[:, :, 1:], zc],
                        axis=-1).reshape(b, h, 1, 4 * co),
        ((0, 0), (0, 0), (0, w - 1), (0, 0)))
    lmask = (ch < co) | ((ch >= 2 * co) & (ch < 3 * co))
    out = jnp.where((ci == 0) & lmask, vl, out)
    # right (B,2H,1,O): q=1 col W-1 -> blocks (1) and (3)
    rcol = right.reshape(b, h, 2, co)
    vr = jnp.pad(
        jnp.concatenate([zc, rcol[:, :, :1], zc, rcol[:, :, 1:]],
                        axis=-1).reshape(b, h, 1, 4 * co),
        ((0, 0), (0, 0), (w - 1, 0), (0, 0)))
    out = jnp.where((ci == w - 1) & ~lmask, vr, out)
    return out


def phase_group_norm(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                     num_groups: int, eps: float = 1e-6) -> jax.Array:
    """GroupNorm of the *hi-res* tensor, computed in phase layout.

    Statistics for a channel group must pool the group's channels across
    all four phase copies (they are the same hi-res channels). Reduce to
    per-(batch, packed-channel) sums first — one pass over the
    activations — then fold the 4 phases and the group's channels on the
    tiny (B, 4C) vectors.

    x: (B, H, W, 4C) phase-packed; gamma/beta: (C,) hi-res params.
    """
    b, h, w, c4 = x.shape
    c = c4 // 4
    g = num_groups
    f32 = x.astype(jnp.float32)
    s1 = f32.sum(axis=(1, 2))                     # (B, 4C)
    s2 = jnp.square(f32).sum(axis=(1, 2))         # (B, 4C)
    n = 4.0 * h * w * (c // g)
    # fold phases and in-group channels: (B, 4, g, C/g) -> (B, g)
    gs1 = s1.reshape(b, 4, g, c // g).sum(axis=(1, 3)) / n
    gs2 = s2.reshape(b, 4, g, c // g).sum(axis=(1, 3)) / n
    var = jnp.maximum(gs2 - jnp.square(gs1), 0.0)
    scale = jax.lax.rsqrt(var + eps)              # (B, g)
    # per packed channel: mean/scale broadcast over phases
    mean_c = jnp.tile(jnp.repeat(gs1, c // g, axis=1), (1, 4))  # (B, 4C)
    scl_c = jnp.tile(jnp.repeat(scale, c // g, axis=1), (1, 4))
    y = (f32 - mean_c[:, None, None, :]) * scl_c[:, None, None, :]
    gamma4 = jnp.tile(gamma.astype(x.dtype), 4)
    beta4 = jnp.tile(beta.astype(x.dtype), 4)
    return y.astype(x.dtype) * gamma4 + beta4
