#!/usr/bin/env python
"""Probe: relayout-free entries into the width-folded SR tail.

Round-4 A/B showed the wfold tail's convs beat the phase tail's by
~2.4 ms each, but the one phase->wfold entry transpose costs ~7 ms
standalone and eats the win (BENCH_NOTES.md). This probe times the
FULL tail (final_b + final_res-like GN/swish/conv pair + final_out +
tanh + unpack) in four forms, all computing the same math:

  phase      — current TPU default: phase-packed 2x2 subpixel layout
               end-to-end (``ops/phase.py``)
  wfold_tr   — final_b emits phases, one transpose re-lays to wfold-2,
               folded chain (current ``MARCONET_TAIL=wfold``)
  wfold_cv   — same, but the relayout expressed as a (2,1)-kernel
               lhs-H-dilated *conv* (selection kernel) instead of a
               transpose — engages the conv emitter, not the transpose
               emitter
  wfold_dir  — final_b itself emits wfold-2 DIRECTLY: one (6,3,I,2O)
               lhs-H-dilated conv whose kernel embeds the composed
               upsample+conv phase kernels at alternating row taps —
               no relayout anywhere (interior-exact here; borders would
               use the same strip patches as the phase form)

Each row prints ms/iter (incl. ~1-3.5 ms tunnel dispatch, equal across
rows) and the max |diff| of the hi-res output vs the phase form on the
interior (1-px hi-res border excluded: wfold_dir's probe form skips
the border strips).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from marconet_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    from marconet_tpu.ops.phase import (
        conv3x3_after_upsample2x_phase,
        phase_conv3x3,
        phase_group_norm,
        phase_unpack,
        upconv_phase_kernel,
    )
    from marconet_tpu.ops.widthfold import (
        phase_to_wfold,
        wfold_conv,
        wfold_group_norm,
        wunfold,
    )

    B = int(os.environ.get("BENCH_BATCH", "16"))
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    CI, C = 128, 64  # final_a output channels -> tail channels (d//4)
    H, W = 64, 1024

    x = jnp.asarray(rng.standard_normal((B, H, W, CI)) * 0.3, dt)
    kb = jnp.asarray(rng.standard_normal((3, 3, CI, C)) * 0.08, dt)  # final_b
    k1 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.08, dt)
    k2 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.08, dt)
    ko = jnp.asarray(rng.standard_normal((3, 3, C, 3)) * 0.08, dt)  # final_out
    gamma = jnp.ones((C,), dt)
    beta = jnp.zeros((C,), dt)
    G = 2  # 32 channels per group at C=64 (GroupNorm convention)

    def lrelu(v):
        return jax.nn.leaky_relu(v, 0.2)

    def swish(v):
        return v * jax.nn.sigmoid(v)

    # ---- phase form (current default) ----
    @jax.jit
    def tail_phase(xx):
        y = lrelu(conv3x3_after_upsample2x_phase(xx, kb))
        r = phase_group_norm(y, gamma, beta, G)
        r = phase_conv3x3(swish(r), k1)
        r = phase_group_norm(r, gamma, beta, G)
        r = phase_conv3x3(swish(r), k2)
        y = y + r
        out = jnp.tanh(phase_conv3x3(y, ko))
        out = phase_unpack(out)
        return xx + (out.mean() * 0).astype(xx.dtype), out

    # ---- wfold chain shared by the three wfold entries ----
    def wfold_rest(y):
        r = wfold_group_norm(y, gamma, beta, G)
        r = wfold_conv(swish(r), k1, 2)
        r = wfold_group_norm(r, gamma, beta, G)
        r = wfold_conv(swish(r), k2, 2)
        y = y + r
        out = jnp.tanh(wfold_conv(y, ko, 2))
        return wunfold(out, 2)

    @jax.jit
    def tail_wfold_tr(xx):
        y = lrelu(conv3x3_after_upsample2x_phase(xx, kb))
        out = wfold_rest(phase_to_wfold(y))
        return xx + (out.mean() * 0).astype(xx.dtype), out

    # ---- relayout as a selection conv (lhs-H-dilated, kernel (2,1)) ----
    # out[2i+p, j, q*C+c] = phase[i, j, (2p+q)*C+c]; dilated row 2i is
    # read by kernel row kr = pl - p with pl = 1
    ksel = np.zeros((2, 1, 4 * C, 2 * C), np.float32)
    for p in (0, 1):
        kr = 1 - p
        for q in (0, 1):
            for c in range(C):
                ksel[kr, 0, (2 * p + q) * C + c, q * C + c] = 1.0
    ksel = jnp.asarray(ksel, dt)

    @jax.jit
    def tail_wfold_cv(xx):
        y = lrelu(conv3x3_after_upsample2x_phase(xx, kb))
        yw = jax.lax.conv_general_dilated(
            y, ksel, (1, 1), ((1, 1), (0, 0)), lhs_dilation=(2, 1),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = wfold_rest(yw)
        return xx + (out.mean() * 0).astype(xx.dtype), out

    # ---- direct wfold final_b: (6,3,CI,2C) lhs-H-dilated conv ----
    # kernel row kr = 3 - p + 2*di  (pl = 3); width taps plain SAME over
    # the low-res columns, output channel block q = hi-res column phase
    k4 = upconv_phase_kernel(kb)  # (3,3,CI,4C), block 2p+q
    k6 = np.zeros((6, 3, CI, 2 * C), np.float32)
    k4np = np.asarray(k4.astype(jnp.float32))
    for p in (0, 1):
        for di in (-1, 0, 1):
            kr = 3 - p + 2 * di
            for q in (0, 1):
                k6[kr, :, :, q * C:(q + 1) * C] += \
                    k4np[di + 1, :, :, (2 * p + q) * C:(2 * p + q + 1) * C]
    k6 = jnp.asarray(k6, dt)

    @jax.jit
    def tail_wfold_dir(xx):
        # edge-pad the low-res input like the phase form (bilinear clamp)
        xp = jnp.pad(xx, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
        xp = jnp.pad(xp, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
        # padded rows i' = i+1; output index o = 2i'+p spans 2..129 of
        # the length-130 conv output ((2*66-1) + 3 + 1 - 6 + 1)
        yw = jax.lax.conv_general_dilated(
            xp, k6, (1, 1), ((3, 1), (0, 0)), lhs_dilation=(2, 1),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        yw = lrelu(yw[:, 2:130])
        out = wfold_rest(yw)
        return xx + (out.mean() * 0).astype(xx.dtype), out

    ref = None
    for name, f in (("phase", tail_phase), ("wfold_tr", tail_wfold_tr),
                    ("wfold_cv", tail_wfold_cv),
                    ("wfold_dir", tail_wfold_dir)):
        try:
            xx, out = f(x)
            out = np.asarray(out.astype(jnp.float32))
            if ref is None:
                ref = out
                err = 0.0
            else:
                err = float(np.abs((out - ref)[:, 1:-1, 1:-1]).max())
            t0 = time.perf_counter()
            a = x
            for _ in range(20):
                a, keep = f(a)
            float(keep.mean())
            t = (time.perf_counter() - t0) / 20
            print(f"{name:10s} {t * 1e3:7.2f} ms   interior maxdiff "
                  f"{err:.3e}", flush=True)
        except Exception as e:  # noqa: BLE001 — probe: report and move on
            print(f"{name:10s} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
