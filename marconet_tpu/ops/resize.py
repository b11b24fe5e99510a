"""Resize ops with PyTorch ``F.interpolate`` semantics (half-pixel bilinear).

Every in-graph resize in the reference networks is a x2 bilinear upsample
with ``align_corners=False`` (``nn.Upsample``/``F.interpolate`` at reference
``models/networks.py:268,318,360,370,415-416``). The reference never calls
StyleGAN's ``upfirdn2d`` — bilinear is the parity semantic to keep.

The x2 half-pixel bilinear kernel has fixed taps (0.25, 0.75)/(0.75, 0.25),
so we implement it directly with pad+interleave arithmetic, which XLA fuses
into neighbouring elementwise work, instead of a general gather-based resize.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp


# x2 half-pixel bilinear taps: out[2i] = 0.25 x[i-1] + 0.75 x[i],
# out[2i+1] = 0.75 x[i] + 0.25 x[i+1]
_TAPS = np.array([0.25, 0.75, 0.75, 0.25], np.float32)
_KERNEL_2D = np.outer(_TAPS, _TAPS)  # separable 4x4 (kept for compose uses)


def _blend_matrix(n: int, dtype) -> jax.Array:
    """(n, 2n) x2 half-pixel bilinear interpolation matrix.

    ``out[j] = 0.75 x[j//2] + 0.25 x[clamp(j//2 +/- 1)]``; edge clamping
    makes both one-hots coincide at the borders, summing to weight 1.0 —
    exactly torch ``F.interpolate(align_corners=False)``. Built from iotas
    so no large constant is embedded in the program.
    """
    src = jax.lax.broadcasted_iota(jnp.int32, (n, 2 * n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, 2 * n), 1)
    p = j // 2
    q = jnp.clip(jnp.where(j % 2 == 0, p - 1, p + 1), 0, n - 1)
    return (0.75 * (src == p) + 0.25 * (src == q)).astype(dtype)


def upsample2x_bilinear(x: jax.Array) -> jax.Array:
    """x2 bilinear upsample of an NHWC tensor, align_corners=False.

    Implemented as one depthwise input-dilated (transposed) convolution of
    the edge-padded input with the fixed separable 4x4 kernel; numerically
    identical to torch ``F.interpolate(..., mode='bilinear')``.

    Formulations measured on v5e at (16,64,1024,128), standalone: this
    depthwise conv 10.8 ms, MXU blend-matmul (``upsample2x_matmul``)
    11.2 ms, jax.image.resize 10.7 ms, interleave/stack 24.6 ms — all
    relayout-bound except the last (element scatters); in the full SR
    program the depthwise form additionally fuses best (end-to-end bench
    regressed ~4% with the matmul form), so it stays the default.
    """
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    kernel = jnp.broadcast_to(
        jnp.asarray(_KERNEL_2D, x.dtype)[:, :, None, None], (4, 4, 1, c))
    return jax.lax.conv_general_dilated(
        xp, kernel, window_strides=(1, 1), padding=((0, 0), (0, 0)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


def upsample2x_matmul(x: jax.Array) -> jax.Array:
    """x2 bilinear upsample via two dense MXU interpolation matmuls.

    Same numerics as ``upsample2x_bilinear``; kept as the measured
    alternative formulation (see that function's docstring).
    """
    b, h, w, c = x.shape
    # width: (B,H,W,C) x (W,2W) -> (B,H,2W,C)
    y = jnp.einsum("bhwc,wk->bhkc", x, _blend_matrix(w, x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    # height: (B,H,2W,C) x (H,2H) -> (B,2H,2W,C)
    y = jnp.einsum("bhkc,hm->bmkc", y, _blend_matrix(h, x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return y


def upsample2x_bilinear_cm(x: jax.Array) -> jax.Array:
    """x2 bilinear upsample of a channels-major (B, C, H, W) tensor.

    Same numerics as ``upsample2x_bilinear`` (two-tap half-pixel blend,
    edge-clamped), formulated as two dense MXU blend matmuls over the
    spatial axes. This is the lane-efficient form for few-channel images:
    an NHWC RGB tensor fills 3/128 vector lanes, so every elementwise or
    resize op on it runs at ~2% VPU efficiency, while channels-major
    keeps W in the lane dimension (see the prior generator's ToRGB skip
    chain, ``ops/modconv.py``).
    """
    b, c, h, w = x.shape
    y = jnp.einsum("bchw,wk->bchk", x, _blend_matrix(w, x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    y = jnp.einsum("bchk,hm->bcmk", y, _blend_matrix(h, x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return y


def compose_bilinear_conv_kernel(k3: jax.Array) -> jax.Array:
    """(3,3,I,O) conv kernel -> (6,6,I,O) kernel equal to
    ``conv3x3(zero-pad 1, upsample2x_bilinear(x))`` as a single dense
    input-dilated convolution of the edge-padded input.

    ``K6[ah+th, aw+tw] += k3[ah, aw] * bilinear4x4[th, tw]`` — the linear
    composition of the two convolutions (interior-exact; the output's
    1-px border needs strip corrections, see ``conv3x3_after_upsample2x``).
    """
    k4 = jnp.asarray(_KERNEL_2D, k3.dtype)
    k6 = jnp.zeros((6, 6) + k3.shape[2:], k3.dtype)
    for ah in range(3):
        for aw in range(3):
            k6 = k6.at[ah:ah + 4, aw:aw + 4].add(
                k3[ah, aw][None, None] * k4[:, :, None, None])
    return k6


def border_strips(x: jax.Array, k3: jax.Array):
    """Exact 1-px border rows/cols of ``conv3x3(zero-SAME, upsample2x(x))``.

    The composed (fused) formulations of upsample+conv are interior-exact
    but differ on the hi-res output's 1-px border, where the conv's zero
    padding of the *intermediate* is not expressible through the dilated/
    phase kernels. These thin slices recompute the border with the exact
    separate path; both the dense composed form
    (``conv3x3_after_upsample2x``) and the phase-layout form
    (``ops/phase.conv3x3_after_upsample2x_phase``) patch them in.

    Returns ``(top, bot, left, right)`` with shapes (B,1,2W,O) x2 and
    (B,2H,1,O) x2; left/right cover the corners (full height).
    """

    def conv(v, pad_h, pad_w):
        return jax.lax.conv_general_dilated(
            v, k3, (1, 1), (pad_h, pad_w),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # top/bottom rows: conv over [zero row, up rows 0..1] (and mirrored)
    up_t = upsample2x_bilinear(x[:, :2])[:, :2]
    up_b = upsample2x_bilinear(x[:, -2:])[:, -2:]
    zrow = jnp.zeros_like(up_t[:, :1])
    top = conv(jnp.concatenate([zrow, up_t], 1), (0, 0), (1, 1))
    bot = conv(jnp.concatenate([up_b, zrow], 1), (0, 0), (1, 1))
    # left/right columns (full height, so the corners match too)
    up_l = upsample2x_bilinear(x[:, :, :2])[:, :, :2]
    up_r = upsample2x_bilinear(x[:, :, -2:])[:, :, -2:]
    zcol = jnp.zeros_like(up_l[:, :, :1])
    left = conv(jnp.concatenate([zcol, up_l], 2), (1, 1), (0, 0))
    right = conv(jnp.concatenate([up_r, zcol], 2), (1, 1), (0, 0))
    return top, bot, left, right


def conv3x3_after_upsample2x(x: jax.Array, k3: jax.Array) -> jax.Array:
    """Exactly ``conv3x3(same-pad, upsample2x_bilinear(x))``, fused.

    The depthwise bilinear upsample runs at ~1/8 HBM bandwidth on TPU and
    its 1 GB-scale intermediate is pure traffic; composing it with the
    following conv into one dense ``lhs_dilation=2`` convolution (kernel
    from ``compose_bilinear_conv_kernel``) is measured ~2x faster at the
    SR net's final_b shape (v5e; BENCH_NOTES.md). The composed conv is
    interior-exact; the four 1-px output borders are recomputed with thin
    slices of the exact path (``border_strips``) and patched in.
    """
    b, h, w, ci = x.shape
    k6 = compose_bilinear_conv_kernel(k3)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    out = jax.lax.conv_general_dilated(
        xp, k6, (1, 1), ((1, 1), (1, 1)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))    # (B, 2H, 2W, O)

    # patch the borders with fused pad+select passes: a chain of
    # ``.at[].set()`` dynamic updates materializes a full-size copy of
    # the (large) output per patch on TPU — measured ~1 ms/GB each —
    # while these wheres fuse into one elementwise pass over the conv
    # output. left/right are applied last and own the corners (same
    # precedence as the sequential sets they replace).
    top, bot, left, right = border_strips(x, k3)
    h2, w2 = 2 * h, 2 * w
    ri = jax.lax.broadcasted_iota(jnp.int32, (1, h2, 1, 1), 1)
    ci_ = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w2, 1), 2)
    out = jnp.where(ri == 0,
                    jnp.pad(top, ((0, 0), (0, h2 - 1), (0, 0), (0, 0))),
                    out)
    out = jnp.where(ri == h2 - 1,
                    jnp.pad(bot, ((0, 0), (h2 - 1, 0), (0, 0), (0, 0))),
                    out)
    out = jnp.where(ci_ == 0,
                    jnp.pad(left, ((0, 0), (0, 0), (0, w2 - 1), (0, 0))),
                    out)
    out = jnp.where(ci_ == w2 - 1,
                    jnp.pad(right, ((0, 0), (0, 0), (w2 - 1, 0), (0, 0))),
                    out)
    return out


def resize_bilinear(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """General bilinear resize (half-pixel centers) of an NHWC tensor."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (oh, ow) == (2 * h, 2 * w):
        return upsample2x_bilinear(x)
    return jax.image.resize(x, (b, oh, ow, c), method="bilinear")
