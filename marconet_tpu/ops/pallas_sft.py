"""Pallas TPU kernel for the SFT write-back (opt-in).

The SFT fusion stage (``models/srnet.py``; reference ``TSPSRNet``,
``models/networks.py:411-485``) resolves per-character window overlap
with deterministic last-writer-wins semantics (``networks.py:448,481``).
The default XLA path expresses that as a one-hot selection matmul (exact,
MXU-friendly); this module keeps the alternative formulation — a
sequential read-modify-write kernel with aligned dynamic-offset HBM DMAs
— as the pattern for shapes where a matmul over ``(W, N*win)`` selection
matrices would dominate (much larger slot counts or canvases than the
reference's 16 x 2048).

Round-2 measurements (v5e, tools/bench_srnet_parts.py): at the
reference's shapes the XLA path is at parity or better, so the kernel is
opt-in via ``MARCONET_PALLAS_SFT=1``. The round-2 fused AdaIN/GroupNorm
window kernels measured at/below XLA parity too (sft64: 50.0 ms XLA vs
51.5/60.8 ms kernels — every ``pallas_call`` is a fusion barrier) and
were removed; see BENCH_NOTES.md for the record.

Columns >= length are invalid (truncated edge windows) and are not
written, matching the masked XLA path. Interpreter mode
(``FORCE_INTERPRET`` / ``interpret=True``) lets the CPU suite pin the
kernel against the XLA reference (``tests/test_pallas_sft.py``).
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

# Tests flip this to exercise the kernel path on CPU via the interpreter
# (see tests/test_pallas_sft.py); compiled Pallas is TPU-only.
FORCE_INTERPRET = False


def use_pallas_sft(update_stats: bool, channels: int) -> bool:
    """Whether SFTFusion should use the Pallas write-back kernel.

    Default OFF: at the reference's shapes the one-hot matmul write-back
    is at parity or better (BENCH_NOTES.md). Opt in with
    ``MARCONET_PALLAS_SFT=1`` for shapes where the selection matmul's
    O(W * N * win) work dominates.

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
