#!/usr/bin/env python
"""Probe: paired vs separate scale/shift SNStack at the real SFT shapes.

``SFTFusion`` runs two 2-conv SNStacks (scale, shift) that both read the
same ``fuse`` tensor — at the 64-high scale a ~0.5 GB bf16 activation.
The paired formulation (``MARCONET_SFT_PAIR=1``, srnet.py) concatenates
the two spectrally-normalized conv1 kernels into ONE 2F-wide conv so
``fuse`` is read once and the MXU contraction is twice as wide; conv2
stays per-half. Exact re-bracketing (tests/test_models.py::TestSFTPair).

This probes just that subgraph standalone — small programs, cheap
remote compiles — so the default can be chosen without paying the full
e2e pipeline's cold compile for both variants.

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

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    # PROBE_SCALE < 1 shrinks batch+channels for a quick smoke run on
    # CPU (the timings are only meaningful at scale 1 on the chip)
    s = float(os.environ.get("PROBE_SCALE", "1"))
    c = max(8, int(256 * s))

    for tag, (bn, h, win) in (("sft32", (max(2, int(256 * s)), 32, 32)),
                              ("sft64", (max(2, int(256 * s)), 64, 64))):
        x = jnp.asarray(rng.standard_normal((bn, h, win, c)) * 0.3, dt)
        w1s = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.02, dt)
        w1h = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.02, dt)
        w2s = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.02, dt)
        w2h = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.02, dt)
        m = jnp.ones((bn, 1, win, 1), dt)

        def conv(v, w):
            return jax.lax.conv_general_dilated(
                v, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def lrelu(v):
            return jnp.where(v >= 0, v, 0.2 * v)

        @jax.jit
        def separate(v, mm):
            a = lrelu(conv(v, w1s) * mm)
            b = lrelu(conv(v, w1h) * mm)
            scale = conv(a, w2s) * mm
            shift = conv(b, w2h) * mm
            out = v * scale + shift
            return out, out.mean()

        @jax.jit
        def paired(v, mm):
            y = lrelu(conv(v, jnp.concatenate([w1s, w1h], -1)) * mm)
            scale = conv(y[..., :c], w2s) * mm
            shift = conv(y[..., c:], w2h) * mm
            out = v * scale + shift
            return out, out.mean()

        # conv FLOPs identical in both forms: 4 convs of 9*c*c per px
        gflop = bn * h * win * 9 * c * c * 2 * 4 / 1e9
        for name, fn in (("separate", separate), ("paired", paired)):
            t = chain_time(fn, (x, m))
            floor = gflop * 1e9 / PEAK
            print(f"{tag} {name:9s} {t * 1e3:7.2f} ms  floor "
                  f"{floor * 1e3:6.2f} ms  mxu {floor / t * 100:5.1f}%",
                  flush=True)


if __name__ == "__main__":
    main()
