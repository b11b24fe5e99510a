#!/usr/bin/env python
"""Probe: why the phase-tail convs run at ~14% true-MXU, and what the
shape's real ceilings are.

`probe_phase_split.py` measured the dense-2 phase conv at 11.4 ms for a
64->64 hi-res-equivalent conv @128x2048 (true-MXU 13.8%, BW floor
~1.3 ms/tensor) — 4x over the bandwidth floor.  This probe separates
layout, kernel-shape and padding effects at the same shapes:

  matmul1x1  — (B,64,1024,4I)@(4I,4O) pointwise: the pure ceiling for
               this activation size (no halo, no padding)
  dense2     — current phase_conv3x3 formulation (two (2,3) convs)
  dense2pad  — same two convs but VALID on ONE shared pre-padded input
               (tests whether the asymmetric SAME pads are the cost)
  conv33pack — a plain (3,3) SAME conv at the packed channel counts
               (tests whether the even (2,3) kernel shape is the cost)

Timings carry ~1-3.5 ms remote-dispatch overhead (axon tunnel).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK = 197e12
HBM_BW = 819e9


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
    from marconet_tpu.ops.phase import phase_conv3x3_kernels

    enable_compilation_cache()

    B = int(os.environ.get("BENCH_BATCH", "16"))
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    for CI, CO in ((64, 64), (128, 64)):
        x = jnp.asarray(rng.standard_normal((B, 64, 1024, 4 * CI)) * 0.3,
                        dt)
        k3 = jnp.asarray(rng.standard_normal((3, 3, CI, CO)) * 0.05, dt)
        k1 = jnp.asarray(rng.standard_normal((4 * CI, 4 * CO)) * 0.05, dt)
        hires_gf = B * 128 * 2048 * 9 * CI * CO * 2 / 1e9
        bw_gb = (B * 64 * 1024 * 4 * (CI + CO) * 2) / 1e9
        print(f"--- {CI}->{CO} hi-res-equivalent @128x2048 "
              f"(MXU floor {hires_gf * 1e12 / PEAK:.2f} ms, "
              f"BW floor {bw_gb * 1e12 / HBM_BW:.2f} ms) ---", flush=True)

        def report(name, t, gf):
            print(f"{name:10s} {t * 1e3:7.2f} ms   "
                  f"own-mxu {gf * 1e9 / PEAK / t * 100:5.1f}%   "
                  f"bw {bw_gb / t:6.0f} GB/s", flush=True)

        @jax.jit
        def matmul1x1(xx, kk):
            y = jnp.einsum("bhwi,io->bhwo", xx, kk,
                           preferred_element_type=dt)
            return xx + (y.mean() * 0).astype(xx.dtype), y

        t = chain_time(matmul1x1, (x, k1))
        report("matmul1x1", t,
               B * 64 * 1024 * 4 * CI * 4 * CO * 2 / 1e9)

        @jax.jit
        def dense2(xx, kk):
            # built from the kernels directly (not phase_conv3x3) so the
            # row times the dense2 form even when MARCONET_PHASE_CONV
            # selects another formulation
            k_p0, k_p1 = phase_conv3x3_kernels(kk.astype(xx.dtype))

            def conv(v, k, pad_h):
                return jax.lax.conv_general_dilated(
                    v, k, (1, 1), (pad_h, (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))

            y = jnp.concatenate([conv(xx, k_p0, (1, 0)),
                                 conv(xx, k_p1, (0, 1))], axis=-1)
            return xx + (y.mean() * 0).astype(xx.dtype), y

        t = chain_time(dense2, (x, k3))
        report("dense2", t, hires_gf * 96 / 36)

        @jax.jit
        def dense2pad(xx, kk):
            k_p0, k_p1 = phase_conv3x3_kernels(kk.astype(xx.dtype))
            xp = jnp.pad(xx, ((0, 0), (1, 1), (1, 1), (0, 0)))

            def vconv(v, k):
                return jax.lax.conv_general_dilated(
                    v, k, (1, 1), ((0, 0), (0, 0)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))

            h, w = xx.shape[1], xx.shape[2]
            # p0 rows read padded rows i..i+1, p1 rows i+1..i+2; both
            # read padded cols j..j+2
            y0 = vconv(xp[:, :h + 1], k_p0)
            y1 = vconv(xp[:, 1:], k_p1)
            y = jnp.concatenate([y0, y1], axis=-1)
            return xx + (y.mean() * 0).astype(xx.dtype), y

        t = chain_time(dense2pad, (x, k3))
        report("dense2pad", t, hires_gf * 96 / 36)

        kp = jnp.asarray(
            rng.standard_normal((3, 3, 4 * CI, 4 * CO)) * 0.02, dt)

        @jax.jit
        def conv33pack(xx, kk):
            y = jax.lax.conv_general_dilated(
                xx, kk, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return xx + (y.mean() * 0).astype(xx.dtype), y

        t = chain_time(conv33pack, (x, kp))
        report("conv33pack", t,
               B * 64 * 1024 * 9 * 4 * CI * 4 * CO * 2 / 1e9)


if __name__ == "__main__":
    main()
