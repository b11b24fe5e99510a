"""Pallas implicit-GEMM 3x3 SAME conv for the windowed SFT stacks.

The SFT fuse/scale/shift convs run on (B*N, H, win, C) window batches
(srnet.py) where XLA's conv lowering measures ~73-78% MXU — its shape
ceiling at these sizes (BENCH_NOTES.md round-2 conv-shape probes). This
kernel expresses the conv as nine shifted (H*W, CI)x(CI, CO) MXU
matmuls accumulated in an f32 VMEM scratch: one grid step per (window,
input-channel block), whole window resident in VMEM, zero-SAME handled
by an in-VMEM padded copy. The win: no im2col materialization, no
HBM round-trips between taps, and MXU-shaped contractions throughout.

Exactness: each hi-res MAC appears exactly once and accumulation is
f32 (like XLA's conv), so results match the XLA conv up to float
reassociation (pinned in tests/test_ops.py::TestPallasConv).

Parity target: these compute the reference's plain torch convs inside
``TSPSRNet`` (``models/networks.py:429-447,462-481``) in a TPU-native
formulation; selection between this and the XLA conv is measured, not
assumed (tools/probe_pallas_conv.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# input-channel block per grid step (lane-aligned, bounds VMEM)
_KBLK = 256


def _conv3x3_kernel(x_ref, w_ref, out_ref, acc_ref, *, h, w, co, out_dtype):
    kb = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[0]                                   # (H, W, KBLK)
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))      # zero-SAME halo
    acc = acc_ref[:]
    for dy in range(3):
        for dx in range(3):
            xs = jax.lax.slice(xp, (dy, dx, 0),
                               (dy + h, dx + w, xp.shape[2]))
            acc = acc + jax.lax.dot_general(
                xs, w_ref[dy, dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    acc_ref[:] = acc

    @pl.when(kb == nk - 1)
    def _():
        out_ref[0] = acc_ref[:].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3x3_same(x: jax.Array, w: jax.Array,
                 interpret: bool = False) -> jax.Array:
    """3x3 zero-SAME conv, NHWC/HWIO, stride 1.

    x: (N, H, W, CI) with CI a multiple of 256 (or exactly CI if <256 is
    lane-padded by the caller); w: (3, 3, CI, CO). Returns (N, H, W, CO)
    in x.dtype. The whole (H, W) plane of one image must fit in VMEM
    (windowed SFT shapes: 64x64 / 32x32).
    """
    n, h, wd, ci = x.shape
    kh, kw, wci, co = w.shape
    assert (kh, kw) == (3, 3) and wci == ci, (w.shape, x.shape)
    kblk = min(_KBLK, ci)
    assert ci % kblk == 0, (ci, kblk)
    nk = ci // kblk

    kernel = functools.partial(_conv3x3_kernel, h=h, w=wd, co=co,
                               out_dtype=x.dtype)
    return pl.pallas_call(
        kernel,
        grid=(n, nk),
        in_specs=[
            pl.BlockSpec((1, h, wd, kblk), lambda i, k: (i, 0, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, kblk, co), lambda i, k: (0, 0, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wd, co), lambda i, k: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wd, co), x.dtype),
        scratch_shapes=[pltpu.VMEM((h, wd, co), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * wd * 9 * ci * co,
            bytes_accessed=(x.size + co * n * h * wd) * x.dtype.itemsize
            + w.size * w.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x, w)
