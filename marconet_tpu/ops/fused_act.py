"""Fused bias + LeakyReLU + sqrt(2) gain.

This is the TPU-native replacement for the one compiled-native op the
reference depends on: basicsr's ``fused_act`` CUDA extension
(fused bias-add + LeakyReLU(0.2) + x*sqrt(2)), imported at reference
``models/networks.py:10`` and used by ``EqualLinear`` (``networks.py:193-195``)
and ``StyledConv`` (``networks.py:241-245``).

Semantics: ``out = scale * leaky_relu(x + bias, negative_slope)`` with bias
broadcast over the trailing channel axis. Defaults match the CUDA op:
``negative_slope=0.2, scale=sqrt(2)``.

Two implementations, dispatched by backend:

* a Pallas TPU kernel (forward + backward via ``jax.custom_vjp``) that keeps
  the op a single VMEM-resident elementwise pass; in larger graphs XLA will
  usually fuse the jnp path into the producing matmul/conv epilogue anyway,
  so the kernel mainly serves standalone use and as the pattern for further
  epilogue fusion;
* a pure-jnp reference implementation used on CPU and as the numerics oracle
  in tests.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT2 = math.sqrt(2.0)


def _fused_lrelu_ref(x, bias, negative_slope, scale):
    if bias is not None:
        x = x + bias  # bias broadcasts over trailing channel axis
    return jnp.where(x >= 0, x, x * negative_slope) * scale


# ---------------------------------------------------------------------------
# Pallas kernels — operate on a 2-D (rows, channels) view.
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, b_ref, o_ref, *, negative_slope, scale):
    # compute in f32: Mosaic on v5e rejects sub-f32 comparisons
    x = x_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    y = jnp.where(x >= 0, x, x * negative_slope) * scale
    o_ref[:] = y.astype(o_ref.dtype)


def _bwd_kernel(x_ref, b_ref, g_ref, dx_ref, *, negative_slope, scale):
    x = x_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    dx = jnp.where(x >= 0, scale, negative_slope * scale) * \
        g_ref[:].astype(jnp.float32)
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _row_tile(n_rows: int, n_cols: int, dtype) -> int:
    """Pick a row-tile that keeps blocks comfortably inside VMEM."""
    bytes_per = jnp.dtype(dtype).itemsize
    budget = 2 * 1024 * 1024  # per-buffer VMEM budget
    t = max(8, budget // max(1, n_cols * bytes_per))
    t = min(t, n_rows)
    # round down to a multiple of 8 (f32 sublane) when possible
    if t >= 8:
        t -= t % 8
    return max(1, t)


def _pallas_elementwise(kernel, x2d, bias, grid_rows_tile):
    rows, cols = x2d.shape
    grid = (pl.cdiv(rows, grid_rows_tile),)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, cols), x2d.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((grid_rows_tile, cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cols), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((grid_rows_tile, cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x2d, bias)


def _use_pallas() -> bool:
    """Default OFF: measured on v5e, the standalone kernel is a fusion
    barrier — XLA fuses the jnp formulation into the producing matmul/conv
    epilogue for free, while a custom call forces an extra HBM round trip.
    The kernel remains available (MARCONET_FUSED_ACT_PALLAS=1) for
    standalone elementwise use and as the epilogue-fusion pattern.
    """
    import os

    if os.environ.get("MARCONET_FUSED_ACT_PALLAS") == "1":
        try:
            return jax.default_backend() == "tpu"
        except Exception:  # pragma: no cover
            return False
    return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused_lrelu_pallas(x, bias, negative_slope, scale):
    return _fused_lrelu_fwd(x, bias, negative_slope, scale)[0]


def _fused_lrelu_fwd(x, bias, negative_slope, scale):
    shape = x.shape
    c = shape[-1]
    x2d = x.reshape(-1, c)
    b2d = bias.astype(x.dtype).reshape(1, c)
    tile = _row_tile(x2d.shape[0], c, x.dtype)
    kern = functools.partial(_fwd_kernel, negative_slope=negative_slope,
                             scale=scale)
    out = _pallas_elementwise(kern, x2d, b2d, tile)
    return out.reshape(shape), (x, bias)


def _fused_lrelu_bwd(negative_slope, scale, res, g):
    x, bias = res
    shape = x.shape
    c = shape[-1]
    x2d = x.reshape(-1, c)
    b2d = bias.astype(x.dtype).reshape(1, c)
    g2d = g.reshape(-1, c)
    tile = _row_tile(x2d.shape[0], c, x.dtype)
    rows, cols = x2d.shape
    grid = (pl.cdiv(rows, tile),)
    kern = functools.partial(_bwd_kernel, negative_slope=negative_slope,
                             scale=scale)
    dx = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((rows, cols), x2d.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cols), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x2d, b2d, g2d)
    dbias = dx.sum(axis=0).astype(bias.dtype)
    return dx.reshape(shape), dbias


_fused_lrelu_pallas.defvjp(_fused_lrelu_fwd, _fused_lrelu_bwd)


def fused_leaky_relu(x, bias=None, negative_slope: float = 0.2,
                     scale: float = _SQRT2, use_pallas: bool | None = None):
    """``scale * leaky_relu(x + bias)`` with bias broadcast on the last axis.

    Args:
      x: array of shape (..., C), channels-last.
      bias: optional (C,) bias.
      negative_slope: LeakyReLU slope (default 0.2).
      scale: output gain (default sqrt(2)).
      use_pallas: force/disable the Pallas kernel; defaults to auto
        (TPU backend only).
    """
    if use_pallas is None:
        use_pallas = _use_pallas()
    if bias is None or not use_pallas:
        return _fused_lrelu_ref(x, bias, negative_slope, scale)
    return _fused_lrelu_pallas(x, bias, float(negative_slope), float(scale))
