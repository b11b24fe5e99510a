#!/usr/bin/env python
"""Probe: conv formulations for a phase-separated (2x2 subpixel) SR tail.

The SR net's final chain (128x2048, 64-128 channels) measures ~31% MXU —
low-channel convs at large spatial are layout-bound on TPU
(BENCH_NOTES.md). A 3x3 conv on the 2x-upsampled canvas is exactly
expressible on the half-res grid with phases packed into channels
(4C channels at HxW instead of C at 2Hx2W). This probe times the raw
conv shapes of each candidate formulation so the tail redesign is
driven by measurement, not hope.

Timings carry ~1-3.5 ms of remote-dispatch overhead each (axon tunnel);
compare relative numbers.
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

    B = int(os.environ.get("BENCH_BATCH", "16"))
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    def mk(shape, scale=0.3):
        return jnp.asarray(rng.standard_normal(shape) * scale, dt)

    def conv(x, k, pad, lhs_dilation=(1, 1)):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), pad, lhs_dilation=lhs_dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def bench(name, fn, args, gflop):
        @jax.jit
        def step(*a):
            out = fn(*a)
            return a[0] + (out.mean() * 0).astype(a[0].dtype), out

        t = chain_time(step, args)
        floor = gflop * 1e9 / PEAK
        print(f"{name:34s} {t*1e3:8.2f} ms   floor {floor*1e3:7.2f} ms"
              f"   mxu {floor/t*100:5.1f}%")

    hi = mk((B, 128, 2048, 64))
    lo = mk((B, 64, 1024, 256))      # phase-packed equivalent
    lo128 = mk((B, 64, 1024, 128))   # final_a output

    # ---- final_res-class conv: 3x3 64->64 at hi-res ----------------------
    g_res = 9 * 64 * 64 * 128 * 2048 * 2 * B / 1e9
    bench("hi  3x3 64->64 @128x2048", lambda x, k: conv(x, k, ((1, 1), (1, 1))),
          (hi, mk((3, 3, 64, 64), 0.05)), g_res)

    # phase: structured 3x3 256->256 (4x FLOPs, dense timing)
    bench("ph  3x3 256->256 @64x1024", lambda x, k: conv(x, k, ((1, 1), (1, 1))),
          (lo, mk((3, 3, 256, 256), 0.05)), 4 * g_res)

    # phase: two (2,3) 256->128 convs (2.67x FLOPs total)
    def two_23(x, k1, k2):
        a = conv(x, k1, ((1, 0), (1, 1)))
        b = conv(x, k2, ((0, 1), (1, 1)))
        return a + b[:, :a.shape[1]]

    bench("ph  2x(2,3) 256->128 @64x1024", two_23,
          (lo, mk((2, 3, 256, 128), 0.05), mk((2, 3, 256, 128), 0.05)),
          (2 * 3 * 256 * 128 * 2) * 64 * 1024 * 2 * B / 1e9)

    # phase: four 2x2 256->64 convs (1.78x FLOPs total); pads are static
    pads = [((1, 0), (1, 0)), ((1, 0), (0, 1)),
            ((0, 1), (1, 0)), ((0, 1), (0, 1))]

    def four_22(x, k0, k1, k2, k3):
        outs = [conv(x, k, p) for k, p in zip((k0, k1, k2, k3), pads)]
        return (outs[0][:, :64, :1024] + outs[1][:, :64, :1024]
                + outs[2][:, :64, :1024] + outs[3][:, :64, :1024])

    bench("ph  4x(2,2) 256->64 @64x1024", four_22,
          (lo,) + tuple(mk((2, 2, 256, 64), 0.05) for _ in range(4)),
          4 * (2 * 2 * 256 * 64) * 64 * 1024 * 2 * B / 1e9)

    # ---- final_b-class: upsample+conv 128->64 ----------------------------
    g_fb = 9 * 128 * 64 * 128 * 2048 * 2 * B / 1e9
    from marconet_tpu.ops.resize import (compose_bilinear_conv_kernel,
                                         upsample2x_bilinear)

    def composed(x, k6):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        return conv(xp, k6, ((1, 1), (1, 1)), lhs_dilation=(2, 2))

    k6 = compose_bilinear_conv_kernel(mk((3, 3, 128, 64), 0.05))
    bench("cur composed 6x6 dil 128->64", composed, (lo128, k6), g_fb)

    # phase form: one 3x3 128->256 conv at low res (same FLOPs as plain)
    bench("ph  3x3 128->256 @64x1024",
          lambda x, k: conv(x, k, ((1, 1), (1, 1))),
          (lo128, mk((3, 3, 128, 256), 0.05)), g_fb)

    # separate upsample + hi-res conv (the pre-fold baseline)
    def up_conv(x, k):
        return conv(upsample2x_bilinear(x), k, ((1, 1), (1, 1)))

    bench("sep up2x + 3x3 128->64", up_conv,
          (lo128, mk((3, 3, 128, 64), 0.05)), g_fb)

    # ---- final_out-class: 64->3 ------------------------------------------
    g_out = 9 * 64 * 3 * 128 * 2048 * 2 * B / 1e9
    bench("hi  3x3 64->3 @128x2048",
          lambda x, k: conv(x, k, ((1, 1), (1, 1))),
          (hi, mk((3, 3, 64, 3), 0.05)), g_out)
    bench("ph  3x3 256->12 @64x1024",
          lambda x, k: conv(x, k, ((1, 1), (1, 1))),
          (lo, mk((3, 3, 256, 12), 0.05)), 4 * g_out)

    # ---- depth-to-space at the tail end ----------------------------------
    def d2s(x):
        b, h, w, c = x.shape
        y = x.reshape(b, h, w, 2, 2, c // 4)
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c // 4)

    bench("d2s (64,1024,12)->(128,2048,3)", lambda x: d2s(x),
          (mk((B, 64, 1024, 12)),), 0.001)

    # ---- GN+swish elementwise at both layouts ----------------------------
    def gn_swish(x):
        m = x.mean(axis=(1, 2), keepdims=True)
        v = x.var(axis=(1, 2), keepdims=True)
        y = (x - m) * jax.lax.rsqrt(v + 1e-5)
        return y * jax.nn.sigmoid(y)

    bench("gn+swish @128x2048x64", lambda x: gn_swish(x), (hi,), 0.001)
    bench("gn+swish @64x1024x256", lambda x: gn_swish(x), (lo,), 0.001)


if __name__ == "__main__":
    main()
