"""Pallas implicit-GEMM 3x3 SAME conv for the windowed SFT stacks.

The SFT fuse/scale/shift convs run on (B*N, H, win, C) window batches
(srnet.py) where XLA's conv lowering measures ~73-78% MXU — its shape
ceiling at these sizes (BENCH_NOTES.md round-2 conv-shape probes). This
kernel expresses the conv as nine shifted (H*W, CI)x(CI, CO) MXU
matmuls accumulated in an f32 VMEM scratch: one grid step per (window,
output-channel block, input-channel block), the whole window resident
in VMEM. Zero-SAME borders are handled by per-tap static edge slices
(no padded copy — VMEM is the binding constraint: the first cut of
this kernel OOM'd scoped vmem at 24 MB with a halo-padded scratch and
chained f32 temporaries). The win over XLA, if any, comes from no
im2col materialization and MXU-shaped contractions throughout; the
choice is measured, not assumed (tools/probe_pallas_conv.py).

Exactness: each hi-res MAC appears exactly once and accumulation is
f32 (like XLA's conv), so results match the XLA conv up to float
reassociation (pinned in tests/test_ops.py::TestPallasConv).

Parity target: these compute the reference's plain torch convs inside
``TSPSRNet`` (``models/networks.py:429-447,462-481``) in a TPU-native
formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-grid-step channel blocks (lane-aligned, bound VMEM)
_KBLK = 256   # input channels
_COBLK = 128  # output channels


def _conv3x3_kernel(x_ref, w_ref, out_ref, acc_ref, *, h, w, out_dtype):
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[0]                                   # (H, W, KBLK)
    # zero-SAME via static edge slices: output[r, c] += x[r+oy, c+ox] @ W
    # restricted to the statically-known valid range per tap
    for dy in range(3):
        oy = dy - 1
        rs, m = max(0, -oy), h - abs(oy)
        for dx in range(3):
            ox = dx - 1
            cs, wv = max(0, -ox), w - abs(ox)
            xs = jax.lax.slice(x, (rs + oy, cs + ox, 0),
                               (rs + oy + m, cs + ox + wv, x.shape[2]))
            acc_ref[rs:rs + m, cs:cs + wv, :] += jax.lax.dot_general(
                xs, w_ref[dy, dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    @pl.when(kb == nk - 1)
    def _():
        out_ref[0] = acc_ref[:].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3x3_same(x: jax.Array, w: jax.Array,
                 interpret: bool = False) -> jax.Array:
    """3x3 zero-SAME conv, NHWC/HWIO, stride 1.

    x: (N, H, W, CI); w: (3, 3, CI, CO); CI % 256 == 0 (or CI == 256's
    divisor handled by one block), CO % 128 == 0. Returns (N, H, W, CO)
    in x.dtype. One (H, W) window plane must fit in VMEM (the windowed
    SFT shapes: 64x64 / 32x32).
    """
    n, h, wd, ci = x.shape
    kh, kw, wci, co = w.shape
    assert (kh, kw) == (3, 3) and wci == ci, (w.shape, x.shape)
    kblk = min(_KBLK, ci)
    coblk = min(_COBLK, co)
    assert ci % kblk == 0 and co % coblk == 0, (ci, co)
    nk, nco = ci // kblk, co // coblk

    kernel = functools.partial(_conv3x3_kernel, h=h, w=wd,
                               out_dtype=x.dtype)
    return pl.pallas_call(
        kernel,
        grid=(n, nco, nk),
        in_specs=[
            pl.BlockSpec((1, h, wd, kblk), lambda i, j, k: (i, 0, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, kblk, coblk),
                         lambda i, j, k: (0, 0, k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wd, coblk),
                               lambda i, j, k: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wd, co), x.dtype),
        scratch_shapes=[pltpu.VMEM((h, wd, coblk), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * wd * 9 * ci * co,
            bytes_accessed=(x.size * nco + co * n * h * wd)
            * x.dtype.itemsize + w.size * w.dtype.itemsize,
            transcendentals=0),
        # the blocks fit in ~13 MB but Mosaic's stack keeps several
        # per-tap temporaries live (slices + f32 dot outputs); the
        # default 16 MB *scoped* limit is below the v5e's physical VMEM,
        # so raise it rather than serialize the taps
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, w)
