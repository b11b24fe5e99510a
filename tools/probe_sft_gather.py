#!/usr/bin/env python
"""Probe: gather/shift formulations for the SFT window stage.

The SFT stages run at 41-46% MXU (bench_srnet_parts); the non-conv
remainder is dominated by two data movements at each scale
(models/srnet.py SFTFusion):

  1. LQ window gather: (B, H, W, C) canvas -> (B, N, H, win, C) windows
     at per-slot starts x1 (vmap'd dynamic_slice today).
  2. Prior crop shift: (B, N, H, 2*win, C) zero-padded priors shifted
     left by per-slot y1 in [0, hw] (vmap'd dynamic_slice_in_dim).

Dynamic-slice with arbitrary (unaligned) minor-dim starts is slow on
TPU; this probe times the alternatives so the redesign is
measurement-driven:

  gather: plain vmap dynamic-slice | 8-aligned dynamic-slice + small
          one-hot shift matmul (contract win+8, not W)
  shift:  vmap dynamic-slice | batched one-hot shift einsum
          (contract 2*win)

Timings carry ~1-3.5 ms remote-dispatch overhead each (axon tunnel);
compare relative numbers. BENCH_BATCH/BENCH_SLOTS env override shapes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def chain_time(step, args0, iters=20):
    # each step returns (carry, out) with carry data-dependent on out, so
    # iterations chain on-device (block_until_ready is unreliable through
    # the tunnel — sync via a host transfer at the end)
    x, keep = step(*args0)
    float(keep.mean())
    t0 = time.perf_counter()
    a = args0
    for _ in range(iters):
        x, keep = step(*a)
        a = (x,) + a[1:]
    float(keep.mean())
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from marconet_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    B = int(os.environ.get("BENCH_BATCH", "16"))
    N = int(os.environ.get("BENCH_SLOTS", "8"))
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    def mk(shape, scale=0.3):
        return jnp.asarray(rng.standard_normal(shape) * scale, dt)

    for H, HW, C in ((32, 16, 256), (64, 32, 256)):
        WIN = 2 * HW
        W = 16 * WIN
        canvas = mk((B, H, W + HW, C))  # pre-padded, as in SFTFusion
        x1 = jnp.asarray(rng.integers(0, W - WIN, (B, N)), jnp.int32)
        y1 = jnp.asarray(rng.integers(0, HW, (B, N)), jnp.int32)
        priors = mk((B, N, H, 2 * WIN, C))

        print(f"--- scale H={H} win={WIN} C={C} (W={W}) ---", flush=True)

        # 1a. plain vmap dynamic-slice gather (current)
        @jax.jit
        def gather_ds(c, x1):
            def one(cb, s):
                return jax.lax.dynamic_slice(
                    cb, (0, s, 0), (H, WIN, C))
            out = jax.vmap(jax.vmap(one, in_axes=(None, 0)))(c, x1)
            return c + (out.mean() * 0).astype(c.dtype), out

        t = chain_time(gather_ds, (canvas, x1))
        print(f"gather dyn-slice      {t * 1e3:7.2f} ms", flush=True)

        # 1b. 8-aligned dynamic-slice + one-hot sub-shift matmul
        @jax.jit
        def gather_aligned(c, x1):
            x1a = (x1 // 8) * 8
            sub = x1 - x1a  # in [0, 8)

            def one(cb, s):
                return jax.lax.dynamic_slice(
                    cb, (0, s, 0), (H, WIN + 8, C))
            wide = jax.vmap(jax.vmap(one, in_axes=(None, 0)))(c, x1a)
            # out[j] = wide[j + sub]: one-hot (B, N, WIN+8, WIN)
            k = jax.lax.broadcasted_iota(jnp.int32, (WIN + 8, WIN), 0)
            j = jax.lax.broadcasted_iota(jnp.int32, (WIN + 8, WIN), 1)
            sel = (k == j + sub[:, :, None, None]).astype(dt)
            out = jnp.einsum("bnhwc,bnwj->bnhjc", wide, sel,
                             preferred_element_type=jnp.float32).astype(dt)
            return c + (out.mean() * 0).astype(c.dtype), out

        t = chain_time(gather_aligned, (canvas, x1))
        print(f"gather aligned+shift  {t * 1e3:7.2f} ms", flush=True)

        # 2a. prior shift via vmap dynamic-slice (current)
        @jax.jit
        def shift_ds(p, y1):
            def crop(pp, s):
                return jax.lax.dynamic_slice_in_dim(pp, s, WIN, axis=1)
            out = jax.vmap(jax.vmap(crop))(p, y1)
            return p + (out.mean() * 0).astype(p.dtype), out

        t = chain_time(shift_ds, (priors, y1))
        print(f"prior shift dyn-slice {t * 1e3:7.2f} ms", flush=True)

        # 2b. prior shift via batched one-hot einsum (contract 2*WIN)
        @jax.jit
        def shift_mm(p, y1):
            k = jax.lax.broadcasted_iota(jnp.int32, (2 * WIN, WIN), 0)
            j = jax.lax.broadcasted_iota(jnp.int32, (2 * WIN, WIN), 1)
            sel = (k == j + y1[:, :, None, None]).astype(dt)
            out = jnp.einsum("bnhwc,bnwj->bnhjc", p, sel,
                             preferred_element_type=jnp.float32).astype(dt)
            return p + (out.mean() * 0).astype(p.dtype), out

        t = chain_time(shift_mm, (priors, y1))
        print(f"prior shift one-hot   {t * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
