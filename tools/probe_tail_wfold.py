#!/usr/bin/env python
"""Probe: width-fold-2 layout vs the 2x2 phase layout for the SR tail.

The tail's hi-res convs (64->64 @128x2048) currently run phase-packed
(``ops/phase.py`` dense2: two (2,3,4I,2O) convs, 2.67x MACs, measured
~49% per-MAC efficiency — the asymmetric kernel pair lowers poorly).
The width-folded layout (``ops/widthfold``) expresses the same conv as
ONE (3,3,2I,2O) conv at 128 channels with 2x MACs — and `wfold` of the
hi-res tensor is a free reshape, while phase pack/unpack are transposes.

Rows (batch 16, bf16, real tail shapes):
  phase_d2   — dense2 phase conv pair (current default), input already
               phase-packed (B,64,1024,4C)
  wfold2     — (3,3,2I,2O) folded conv, input already w-folded
               (B,128,1024,2C): the steady-state cost per conv
  ph2wf      — one phase->wfold relayout (B,64,1024,4C)->(B,128,1024,2C):
               the one-time entry cost if final_b keeps emitting phases
  chain3_ph  — final_res+final_out-like chain (3 convs) in phase layout
  chain3_wf  — same chain in wfold2 layout incl. the entry relayout

Timings carry ~1-3.5 ms remote-dispatch overhead (axon tunnel).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK = 197e12


def chain_time(step, args0, iters=20):
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
    from marconet_tpu.ops.phase import phase_conv3x3_kernels
    from marconet_tpu.ops.widthfold import wfold_conv

    B = int(os.environ.get("BENCH_BATCH", "16"))
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    C = 64  # tail channel count (d // 4)

    hires_gf = B * 128 * 2048 * 9 * C * C * 2 / 1e9

    def report(name, t, gf):
        print(f"{name:10s} {t * 1e3:7.2f} ms   own-mxu "
              f"{gf * 1e9 / PEAK / t * 100:5.1f}%", flush=True)

    xp = jnp.asarray(rng.standard_normal((B, 64, 1024, 4 * C)) * 0.3, dt)
    xw = jnp.asarray(rng.standard_normal((B, 128, 1024, 2 * C)) * 0.3, dt)
    k3 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, dt)

    @jax.jit
    def phase_d2(xx, kk):
        k_p0, k_p1 = phase_conv3x3_kernels(kk.astype(xx.dtype))

        def conv(v, k, pad_h):
            return jax.lax.conv_general_dilated(
                v, k, (1, 1), (pad_h, (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        y = jnp.concatenate([conv(xx, k_p0, (1, 0)),
                             conv(xx, k_p1, (0, 1))], axis=-1)
        return xx + (y.mean() * 0).astype(xx.dtype), y

    report("phase_d2", chain_time(phase_d2, (xp, k3)),
           hires_gf * 96 / 36)

    @jax.jit
    def wfold2(xx, kk):
        y = wfold_conv(xx, kk, 2)
        return xx + (y.mean() * 0).astype(xx.dtype), y

    report("wfold2", chain_time(wfold2, (xw, k3)), hires_gf * 2)

    @jax.jit
    def ph2wf(xx):
        # (B, H, W, [2p+q]*C) -> hi-res rows unpacked, columns folded:
        # (B, 2H, W, [q]*C); row 2i+p col-block q = phase block 2p+q
        b, h, w, c4 = xx.shape
        c = c4 // 4
        y = xx.reshape(b, h, w, 2, 2 * c)
        y = y.transpose(0, 1, 3, 2, 4).reshape(b, 2 * h, w, 2 * c)
        return xx + (y.mean() * 0).astype(xx.dtype), y

    report("ph2wf", chain_time(ph2wf, (xp,)), hires_gf * 0 + 1e-9)

    def chain3(conv1):
        def f(xx, kk):
            y = conv1(xx, kk)
            y = conv1(y, kk)
            y = conv1(y, kk)
            return xx + (y.mean() * 0).astype(xx.dtype), y
        return jax.jit(f)

    def pconv(v, kk):
        k_p0, k_p1 = phase_conv3x3_kernels(kk.astype(v.dtype))
        y0 = jax.lax.conv_general_dilated(
            v, k_p0, (1, 1), ((1, 0), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y1 = jax.lax.conv_general_dilated(
            v, k_p1, (1, 1), ((0, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.concatenate([y0, y1], axis=-1)

    report("chain3_ph", chain_time(chain3(pconv), (xp, k3)),
           3 * hires_gf * 96 / 36)

    @jax.jit
    def chain3_wf(xx, kk):
        b, h, w, c4 = xx.shape
        c = c4 // 4
        y = xx.reshape(b, h, w, 2, 2 * c)
        y = y.transpose(0, 1, 3, 2, 4).reshape(b, 2 * h, w, 2 * c)
        for _ in range(3):
            y = wfold_conv(y, kk, 2)
        return xx + (y.mean() * 0).astype(xx.dtype), y

    report("chain3_wf", chain_time(chain3_wf, (xp, k3)),
           3 * hires_gf * 2)


if __name__ == "__main__":
    main()
