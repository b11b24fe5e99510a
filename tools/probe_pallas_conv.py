#!/usr/bin/env python
"""Probe: Pallas implicit-GEMM conv3x3 vs XLA conv at the SFT shapes.

XLA's conv lowering measures ~73-78% MXU at the windowed SFT stack
shapes — its ceiling per the round-2 conv-shape probes. This times the
Pallas kernel (ops/pallas_conv.py) against `lax.conv_general_dilated`
at the exact shapes where ~30 ms/batch of conv time lives (sft64 fuse/
scale/shift stacks, sft32 stacks; BENCH_NOTES.md round-4 part split).

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
    from marconet_tpu.ops.pallas_conv import conv3x3_same

    enable_compilation_cache()

    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    # (label, N, H, W, CI, CO) — the windowed SFT conv stack shapes at
    # batch 16 x 8 slots, plus the up64 canvas shape for reference
    cases = [
        ("sft64 fuse c1", 128, 64, 64, 512, 256),
        ("sft64 s/s c",   128, 64, 64, 256, 256),
        ("sft32 fuse c1", 128, 32, 32, 1024, 512),
        ("sft32 s/s c",   128, 32, 32, 512, 512),
    ]
    for label, n, h, wd, ci, co in cases:
        x = jnp.asarray(rng.standard_normal((n, h, wd, ci)) * 0.3, dt)
        w = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.05, dt)
        gf = 2 * n * h * wd * 9 * ci * co / 1e9
        floor_ms = gf / (PEAK / 1e9) * 1e3  # GFLOP / (GFLOP/s) -> ms

        @jax.jit
        def xla_conv(xx, ww):
            y = jax.lax.conv_general_dilated(
                xx, ww, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return xx + (y.mean() * 0).astype(xx.dtype), y

        @jax.jit
        def pallas_conv(xx, ww):
            y = conv3x3_same(xx, ww)
            return xx + (y.mean() * 0).astype(xx.dtype), y

        t_x = chain_time(xla_conv, (x, w))
        t_p = chain_time(pallas_conv, (x, w))
        # numeric check (bf16 conv, f32 accumulate both ways)
        yx = xla_conv(x, w)[1]
        yp = pallas_conv(x, w)[1]
        err = float(jnp.max(jnp.abs(yx.astype(jnp.float32)
                                    - yp.astype(jnp.float32))))
        print(f"{label:14s} floor {floor_ms:5.2f} ms | "
              f"xla {t_x * 1e3:6.2f} ms ({floor_ms / (t_x * 1e3):4.0%})"
              f" | pallas {t_p * 1e3:6.2f} ms"
              f" ({floor_ms / (t_p * 1e3):4.0%}) | maxerr {err:.3e}",
              flush=True)


if __name__ == "__main__":
    main()
