"""Pallas TPU kernels for the per-character SFT window path.

The SFT fusion stage (``models/srnet.py``; reference ``TSPSRNet``,
``models/networks.py:411-485``) is the SR network's hot spot. Its conv
stacks run close to the MXU FLOP bound, but the surrounding elementwise
work — masked AdaIN statistics, masked GroupNorm moments, the concat, and
the overlap-resolving write-back — is a chain of HBM-bound passes that XLA
cannot fuse into single reads. These kernels collapse each chain into one
VMEM pass:

``adain_gn_windows``
    canvas + per-slot priors in -> window gather (aligned DMA + exact
    column-shift matmul), prior-crop alignment, masked AdaIN (prior
    renormalized to LQ stats, ``networks.py:518-533``) + masked GroupNorm
    + swish of the virtual ``concat([adain, lq])`` tensor, emitted
    directly as the two tensors the fuse ResTextBlock consumes (the
    normed/activated input of ``conv1`` and the raw concat for the 1x1
    skip) — statistics in f32.

``gn_swish``
    masked GroupNorm + swish in one pass (the fuse block's ``norm2``).

``sft_writeback``
    computes the SFT residual ``lq * scale + shift`` in-VMEM and writes
    each character's window into the canvas sequentially in slot order,
    reproducing the reference's deterministic last-writer-wins overlap
    semantics (``networks.py:448,481``) with read-modify-write DMAs instead
    of the one-hot selection matmul.

All kernels have an ``interpret`` mode used by the CPU test suite
(``tests/test_pallas_sft.py``) to pin them against the XLA reference
implementations in ``ops/layers.py`` / ``models/srnet.py``.

Columns >= length are invalid (truncated edge windows); statistics use
analytic counts and outputs are zeroed there, matching the masked XLA path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
# column alignment for dynamic-offset HBM window DMAs (sublane tile,
# covering the bf16 packed (8,128)(2,1) layout)
_ALIGN = 16

# Tests flip this to exercise the fused path on CPU via the interpreter
# (see tests/test_pallas_sft.py); compiled Pallas is TPU-only.
FORCE_INTERPRET = False


def use_pallas_sft(update_stats: bool, channels: int) -> bool:
    """Whether the SFT modules should take the fused Pallas path.

    Default OFF: measured on v5e (tools/bench_srnet_parts.py, batch 16),
    XLA's pipelined fusion of the masked-moment/gather/write-back chains
    already sits at parity — sft_64 scale 50.0 ms (XLA) vs 51.5 ms
    (Pallas kernels fed by BlockSpec windows) vs 60.8 ms (kernel-side
    DMA gather; the per-step serialized DMAs lose to the pipelined
    BlockSpec prefetch). The kernels remain available
    (MARCONET_PALLAS_SFT=1) as the fusion pattern for future shapes and
    are pinned by interpreter-mode tests either way.

    Inference-only (the XLA path carries the gradients for training),
    lane-aligned channel counts only (width-reduced CI configs fall back),
    TPU backend only — unless a test forces interpreter mode.
    """
    if update_stats or channels % _LANES:
        return False
    if FORCE_INTERPRET:
        return True
    if os.environ.get("MARCONET_PALLAS_SFT") != "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _colmask(h, w, length, dtype):
    """(h, w, LANES) mask of columns < length."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w, _LANES), 1)
    return (cols < length).astype(dtype)


def _channel_stats(x, m, count):
    """Masked per-lane (channel) mean and E[x^2] in f32.

    x: (h, w, LANES) f32 already masked; m: mask; count: scalar f32.
    """
    s = jnp.sum(x, axis=(0, 1))
    s2 = jnp.sum(x * x, axis=(0, 1))
    return s / count, s2 / count


def _gn_swish_block(x, gamma, beta, m, count, cpg, eps):
    """Masked GroupNorm (+ affine) + swish on one (h, w, LANES) block.

    Group stats are computed per ``cpg``-channel group from lane-wise
    sums; torch GroupNorm semantics (biased variance, eps on variance).
    """
    f32 = x.astype(jnp.float32) * m
    s = jnp.sum(f32, axis=(0, 1))[None, :]           # (1, LANES)
    s2 = jnp.sum(f32 * f32, axis=(0, 1))[None, :]
    # aggregate within each cpg-lane group via a same-group 0/1 matmul
    # (Mosaic does not support cross-lane reshapes); each lane ends up
    # holding its group's sum, which also broadcasts the stats back
    li = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0) // cpg
    lj = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1) // cpg
    agg = (li == lj).astype(jnp.float32)
    gcnt = count * cpg
    mean = jnp.dot(s, agg, preferred_element_type=jnp.float32)[0] / gcnt
    gs2 = jnp.dot(s2, agg, preferred_element_type=jnp.float32)[0] / gcnt
    var = jnp.maximum(gs2 - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    y = ((f32 - mean[None, None, :]) * rstd[None, None, :]).astype(x.dtype)
    y = y * gamma[0][None, None, :] + beta[0][None, None, :]
    y = y * m.astype(y.dtype)
    # sigmoid in f32: Mosaic's bf16 logistic lowering emits an invalid
    # mixed-type broadcast (f32 scalar into a bf16 vector)
    return y * jax.nn.sigmoid(y.astype(jnp.float32)).astype(y.dtype)


# ---------------------------------------------------------------------------
# adain_gn_windows
# ---------------------------------------------------------------------------


def _shift_cols(buf, shift, out_w):
    """out[j] = buf[j + shift] via an exact one-hot matmul.

    buf: (h, w_in, c); shift: dynamic scalar; returns (h, out_w, c).
    Selection matmul, so low-precision accumulation would be exact —
    Mosaic requires a 32-bit accumulator regardless.
    """
    w_in = buf.shape[1]
    j_ids = jax.lax.broadcasted_iota(jnp.int32, (out_w, w_in), 0)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (out_w, w_in), 1)
    p = (k_ids == j_ids + shift).astype(buf.dtype)
    out = jax.lax.dot_general(
        p, buf, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(buf.dtype)                       # (j, h, c)
    return jnp.transpose(out, (1, 0, 2))      # (h, j, c)


def _adain_gn_kernel(x1_ref, y1_ref, len_ref, canvas_ref, prior_ref,
                     gamma_ref, beta_ref, y_ref, xin_ref, raw, cache,
                     sem, *, nct, cpg, eps_gn, eps_adain, width, win):
    b = pl.program_id(0)
    s = pl.program_id(1)
    ct = pl.program_id(2)
    h = prior_ref.shape[2]
    length = len_ref[b, s]
    m = _colmask(h, win, length, jnp.float32)
    count = jnp.maximum(length.astype(jnp.float32), 1.0) * h

    def stats(f32):
        mean, ex2 = _channel_stats(f32, m, count)
        var = jnp.maximum(ex2 - mean * mean, 0.0)
        # unbiased variance + eps under the sqrt (calc_mean_std_4D)
        var = var * (count / jnp.maximum(count - 1.0, 1.0))
        return mean, jnp.sqrt(var + eps_adain)

    def emit(x):
        xin_ref[0, 0] = x
        y_ref[0, 0] = _gn_swish_block(x, gamma_ref, beta_ref, m, count,
                                      cpg, eps_gn)

    @pl.when(ct < nct)
    def _adain_half():
        # gather this channel tile's LQ window straight from the canvas:
        # aligned wide DMA + in-VMEM column shift (see sft_writeback)
        x1 = x1_ref[b, s]
        x1a = jnp.minimum(
            (jnp.minimum(x1, width - win) // _ALIGN) * _ALIGN,
            width - (win + _ALIGN))
        x1a = pl.multiple_of(x1a, _ALIGN)
        cp = pltpu.make_async_copy(
            canvas_ref.at[b, :, pl.ds(x1a, win + _ALIGN),
                          pl.ds(ct * _LANES, _LANES)], raw, sem)
        cp.start()
        cp.wait()
        lqw = _shift_cols(raw[...], x1 - x1a, win)
        cache[ct] = lqw  # reused by this (b, s)'s lq-half step below
        # prior crop: content lives at [y1, y1+length) -> align to 0
        prw = _shift_cols(prior_ref[0, 0], y1_ref[b, s], win)

        lq32 = lqw.astype(jnp.float32) * m
        p32 = prw.astype(jnp.float32) * m
        lmean, lstd = stats(lq32)
        pmean, pstd = stats(p32)
        out = (p32 - pmean[None, None, :]) / pstd[None, None, :] \
            * lstd[None, None, :] + lmean[None, None, :]
        emit((out * m).astype(lqw.dtype))

    @pl.when(ct >= nct)
    def _lq_half():
        emit(cache[jnp.maximum(ct - nct, 0)] * m.astype(cache.dtype))


def adain_gn_windows(canvas, priors, x1, y1, lengths, gamma, beta, *,
                     cpg=32, eps_gn=1e-6, eps_adain=1e-5, interpret=None):
    """Fused window gather + masked AdaIN + GroupNorm + swish.

    Extracts each character slot's constant-width LQ window from the
    canvas (aligned DMA + exact column-shift matmul), aligns the prior
    crop, renormalizes the prior to the LQ window statistics
    (``calc_mean_std_4D`` semantics) and emits the fuse block's two
    inputs — all in one VMEM pass per channel tile.

    Args:
      canvas: (B, H, W, C) LQ feature canvas.
      priors: (B, S, H, win, C) per-slot prior features (content at
        columns [y1, y1+length)).
      x1, y1, lengths: (B, S) int32 window geometry
        (``models/srnet._window_geometry``).
      gamma, beta: (2C,) affines of the GroupNorm over the virtual
        concat([adain, lq]).
    Returns:
      y:   (B, S, H, win, 2C) = swish(group_norm(concat)), masked.
      xin: (B, S, H, win, 2C) = concat([adain, lq_window]) masked.
    """
    if interpret is None:
        interpret = FORCE_INTERPRET
    b, h, width, c = canvas.shape
    s = priors.shape[1]
    win = priors.shape[3]
    assert c % _LANES == 0 and _LANES % cpg == 0
    assert width % _ALIGN == 0 and win % _ALIGN == 0
    assert width >= win + _ALIGN
    nct = c // _LANES

    kernel = functools.partial(_adain_gn_kernel, nct=nct, cpg=cpg,
                               eps_gn=eps_gn, eps_adain=eps_adain,
                               width=width, win=win)
    out_spec = pl.BlockSpec((1, 1, h, win, _LANES),
                            lambda bb, ss, ct, *_: (bb, ss, 0, 0, ct),
                            memory_space=pltpu.VMEM)
    y, xin = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, s, 2 * nct),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),   # canvas
                # prior: used for ct < nct; afterwards keep mapping the
                # last block so the pipeline skips the fetch
                pl.BlockSpec((1, 1, h, win, _LANES),
                             lambda bb, ss, ct, *_:
                             (bb, ss, 0, 0, jnp.minimum(ct, nct - 1)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _LANES), lambda bb, ss, ct, *_: (0, ct),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _LANES), lambda bb, ss, ct, *_: (0, ct),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[out_spec, out_spec],
            scratch_shapes=[
                pltpu.VMEM((h, win + _ALIGN, _LANES), canvas.dtype),
                pltpu.VMEM((nct, h, win, _LANES), canvas.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, s, h, win, 2 * c), canvas.dtype),
            jax.ShapeDtypeStruct((b, s, h, win, 2 * c), canvas.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x1.astype(jnp.int32), y1.astype(jnp.int32),
      lengths.astype(jnp.int32), canvas, priors,
      gamma.reshape(1, -1).astype(canvas.dtype),
      beta.reshape(1, -1).astype(canvas.dtype))
    return y, xin


# ---------------------------------------------------------------------------
# gn_swish
# ---------------------------------------------------------------------------


def _gn_swish_kernel(len_ref, x_ref, gamma_ref, beta_ref, y_ref, *,
                     cpg, eps):
    b = pl.program_id(0)
    h, w = x_ref.shape[1], x_ref.shape[2]
    length = len_ref[b]
    m = _colmask(h, w, length, jnp.float32)
    count = jnp.maximum(length.astype(jnp.float32), 1.0) * h
    y_ref[0] = _gn_swish_block(x_ref[0], gamma_ref, beta_ref, m, count,
                               cpg, eps)


def gn_swish(x, lengths, gamma, beta, *, cpg=32, eps=1e-6,
             interpret=None):
    """Masked GroupNorm + swish in one pass.

    x: (B, H, W, C); lengths: (B,) int32; gamma/beta: (C,).
    """
    if interpret is None:
        interpret = FORCE_INTERPRET
    bs, h, w, c = x.shape
    assert c % _LANES == 0 and _LANES % cpg == 0
    kernel = functools.partial(_gn_swish_kernel, cpg=cpg, eps=eps)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bs, c // _LANES),
            in_specs=[
                pl.BlockSpec((1, h, w, _LANES),
                             lambda b, ct, *_: (b, 0, 0, ct),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _LANES), lambda b, ct, *_: (0, ct),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _LANES), lambda b, ct, *_: (0, ct),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, h, w, _LANES),
                                   lambda b, ct, *_: (b, 0, 0, ct),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), x,
      gamma.reshape(1, -1).astype(x.dtype),
      beta.reshape(1, -1).astype(x.dtype))


# ---------------------------------------------------------------------------
# sft_writeback
# ---------------------------------------------------------------------------


def _writeback_kernel(x1_ref, len_ref, valid_ref, canvas_ref, res_ref,
                      out_ref, win_scratch, old_scratch, sems, *,
                      width, win, ct):
    b = pl.program_id(0)
    step = pl.program_id(1)
    cc = pl.program_id(2)
    c0 = cc * ct

    @pl.when(step == 0)
    def _copy():
        # initialize the output canvas with the input canvas (uncovered
        # columns keep their value; covered ones are overwritten below)
        cp = pltpu.make_async_copy(canvas_ref.at[b, :, :, pl.ds(c0, ct)],
                                   out_ref.at[b, :, :, pl.ds(c0, ct)],
                                   sems.at[0])
        cp.start()
        cp.wait()

    @pl.when(step > 0)
    def _slot():
        s = step - 1
        x1 = x1_ref[b, s]
        length = len_ref[b, s]
        valid = valid_ref[b, s] > 0
        # HBM windows must start at a sublane-tile-aligned column: align
        # the window start down and widen the read/write to win + ALIGN;
        # the sub-tile offset is folded into the shift matmul below.
        x1a = jnp.minimum((jnp.minimum(x1, width - win) // _ALIGN) * _ALIGN,
                          width - (win + _ALIGN))
        x1a = pl.multiple_of(x1a, _ALIGN)
        shift = x1 - x1a  # in [0, win + ALIGN)
        wide = win + _ALIGN

        @pl.when(valid)
        def _():
            res = res_ref[0, 0]                           # (h, win, ct)

            # place window column j at wide-window column j + shift via an
            # exact one-hot matmul (selection — f32 accumulation required
            # by Mosaic, exact either way): shifted[k] = res[k - shift]
            # (a dynamic pltpu.roll would be cheaper but only supports
            # 32-bit data)
            k_ids = jax.lax.broadcasted_iota(jnp.int32, (wide, win), 0)
            j_ids = jax.lax.broadcasted_iota(jnp.int32, (wide, win), 1)
            p = (k_ids - j_ids == shift).astype(res.dtype)
            shifted = jax.lax.dot_general(
                p, res, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(res.dtype)                           # (k, h, ct)
            shifted = jnp.transpose(shifted, (1, 0, 2))   # (h, k, ct)

            # fetch the current window (older slots' writes) and the
            # original canvas window
            cp_old = pltpu.make_async_copy(
                out_ref.at[b, :, pl.ds(x1a, wide), pl.ds(c0, ct)],
                old_scratch, sems.at[1])
            cp_can = pltpu.make_async_copy(
                canvas_ref.at[b, :, pl.ds(x1a, wide), pl.ds(c0, ct)],
                win_scratch, sems.at[2])
            cp_old.start()
            cp_can.start()
            cp_old.wait()
            cp_can.wait()

            cols = jax.lax.broadcasted_iota(jnp.int32, (wide, 1), 0)
            cov = (cols >= shift) & (cols < shift + length)
            old_scratch[...] = jnp.where(
                cov, win_scratch[...] + shifted, old_scratch[...])
            cp_out = pltpu.make_async_copy(
                old_scratch,
                out_ref.at[b, :, pl.ds(x1a, wide), pl.ds(c0, ct)],
                sems.at[1])
            cp_out.start()
            cp_out.wait()


def sft_writeback(canvas, res, x1, lengths, valid, *, interpret=None):
    """canvas + per-slot SFT residual with last-writer-wins overlap.

    Args:
      canvas: (B, H, W, C).
      res: (B, S, H, win, C) per-slot residual windows
        (``lq_win * scale + shift``, computed by the caller so the kernel
        stays within the 16M scoped-VMEM budget at the 64-high scale).
      x1: (B, S) int32 window starts; lengths: (B, S) int32 valid widths;
        valid: (B, S) slot validity (int32/float, >0 = valid).
    Returns:
      (B, H, W, C) canvas with each valid slot's residual added over
      columns [x1, x1+length), later slots overwriting earlier ones.
    """
    if interpret is None:
        interpret = FORCE_INTERPRET
    b, h, width, c = canvas.shape
    s = res.shape[1]
    win = res.shape[3]
    ct = min(c, _LANES)
    assert c % ct == 0
    # alignment contract for the HBM window DMAs (sublane tiling)
    assert width % _ALIGN == 0 and win % _ALIGN == 0
    assert width >= win + _ALIGN
    kernel = functools.partial(_writeback_kernel, width=width, win=win,
                               ct=ct)
    win_spec = pl.BlockSpec(
        (1, 1, h, win, ct),
        lambda bb, st, cc, *_: (bb, jnp.maximum(st - 1, 0), 0, 0, cc),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, s + 1, c // ct),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),   # canvas
                win_spec,
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((h, win + _ALIGN, ct), canvas.dtype),
                pltpu.VMEM((h, win + _ALIGN, ct), canvas.dtype),
                pltpu.SemaphoreType.DMA((3,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(canvas.shape, canvas.dtype),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # the shift matmul's f32 temporaries push past the conservative
            # 16M scoped-vmem default at the 64-high scale
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x1.astype(jnp.int32), lengths.astype(jnp.int32),
      valid.astype(jnp.int32), canvas, res)
