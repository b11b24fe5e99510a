#!/usr/bin/env python
"""Probe: XLA:TPU compiler options vs the conv emitter at the SFT shapes.

The SFT conv stacks sit at XLA's measured ~75% MXU ceiling
(BENCH_NOTES.md round-4 part split; the hand Pallas implicit-GEMM conv
loses 2x to it). Before accepting 75% as physics, sweep the compiler
knobs that bound the conv emitter's tiling: the scoped-VMEM limit
(deeper fusion / bigger conv tiles) and flag combos passed per-jit via
``compiler_options`` — which, unlike ``XLA_FLAGS``, reach the
*remote* compiler under the axon tunnel.

Rows: the sft64 fuse conv1 (512->256) and scale/shift conv (256->256)
at the real window-batched shapes, plus the up64-like wide-canvas conv.
Each timed under each option set. ~1-3.5 ms dispatch per step applies
to every row equally.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK = 197e12


def main():
    import jax
    import jax.numpy as jnp

    from marconet_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    B = 16
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    shapes = [
        ("sft64 fuse c1", (B * 8, 64, 64, 512), 256),
        ("sft64 s/s c", (B * 8, 64, 64, 256), 256),
        ("up64-like", (B, 64, 1024, 256), 256),
    ]

    option_sets = [
        ("default", None),
        ("vmem64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
        ("vmem96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ]

    for name, xshape, co in shapes:
        ci = xshape[-1]
        x = jnp.asarray(rng.standard_normal(xshape) * 0.3, dt)
        k = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.05, dt)
        gf = (np.prod(xshape[:-1]) * 9 * ci * co * 2) / 1e9
        floor = gf * 1e9 / PEAK
        print(f"--- {name} {xshape}->{co}  floor {floor * 1e3:.2f} ms ---",
              flush=True)

        def f(xx, kk):
            y = jax.lax.conv_general_dilated(
                xx, kk, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return xx + (y.mean() * 0).astype(xx.dtype), y

        for oname, opts in option_sets:
            try:
                fj = jax.jit(f, compiler_options=opts) if opts else jax.jit(f)
                xx, keep = fj(x, k)
                float(keep.mean())
                t0 = time.perf_counter()
                a = x
                for _ in range(20):
                    a, keep = fj(a, k)
                float(keep.mean())
                t = (time.perf_counter() - t0) / 20
                print(f"  {oname:10s} {t * 1e3:7.2f} ms   "
                      f"mxu {floor / t * 100:5.1f}%", flush=True)
            except Exception as e:  # noqa: BLE001 — probe: report and move on
                print(f"  {oname:10s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
