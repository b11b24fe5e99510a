#!/usr/bin/env python
"""Probe: zero-free decompositions of the phase-layout 3x3 conv.

``phase_conv3x3`` (ops/phase.py) runs a hi-res 3x3 conv on the 2x2
phase-packed grid as two dense (2,3,4I,2O) convs. Those kernels are
~2/3 zeros (each output phase truly reads only 9 of the 24 packed
taps), so the form does 2.67x the hi-res MACs — it wins at the SR
tail's 64-ch shapes only because the plain conv sits at ~25% MXU.

A zero-free decomposition groups taps by (output row phase p, input row
phase r) x (output col phase q, input col phase s): 16 small convs of
shape (<=2, <=2, I, O) summing to exactly the hi-res MAC count, at the
cost of more programs/fusion barriers. The 4-conv variant splits rows
only (2x MACs). This probe times all three at the tail shapes so the
choice is measured.

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

    from marconet_tpu.ops.phase import phase_conv3x3

    B = int(os.environ.get("BENCH_BATCH", "16"))
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    # tail shapes: packed (B, 64, 1024, 4C) for hi-res 128x2048 x C
    for CI, CO in ((64, 64), (128, 64)):
        x = jnp.asarray(rng.standard_normal((B, 64, 1024, 4 * CI)) * 0.3,
                        dt)
        k3 = jnp.asarray(rng.standard_normal((3, 3, CI, CO)) * 0.05, dt)
        gf = B * 128 * 2048 * 9 * CI * CO * 2 / 1e9
        floor = gf * 1e9 / PEAK
        print(f"--- hi-res conv {CI}->{CO} @128x2048 "
              f"(floor {floor * 1e3:.2f} ms) ---", flush=True)

        @jax.jit
        def dense2(xx, kk):
            y = phase_conv3x3(xx, kk)
            return xx + (y.mean() * 0).astype(xx.dtype), y

        t = chain_time(dense2, (x, k3))
        print(f"dense 2-conv (current)  {t * 1e3:7.2f} ms "
              f"(true-mxu {floor / t * 100:5.1f}%)", flush=True)

        # --- 16-conv zero-free decomposition --------------------------
        # out phase (p, q) <- in phase (r, s) with row taps dy where
        # (p+dy)%2==r and col taps dx where (q+dx)%2==s; the low-res
        # offsets di=(p+dy-r)//2 in {-1,0,1} span <=2 rows per (p,r).
        def conv_pq(xx, kk_small, pad_h, pad_w):
            return jax.lax.conv_general_dilated(
                xx, kk_small, (1, 1), (pad_h, pad_w),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def split16(xx, kk):
            ci = kk.shape[2]
            halves_in = {}
            for r in (0, 1):
                for s in (0, 1):
                    blk = 2 * r + s
                    halves_in[(r, s)] = xx[..., blk * ci:(blk + 1) * ci]
            outs = []
            for p in (0, 1):
                for q in (0, 1):
                    acc = None
                    for r in (0, 1):
                        for s in (0, 1):
                            # taps for this (p,r)x(q,s) block
                            dys = [dy for dy in (-1, 0, 1)
                                   if (p + dy) % 2 == r]
                            dxs = [dx for dx in (-1, 0, 1)
                                   if (q + dx) % 2 == s]
                            dis = sorted((p + dy - r) // 2 for dy in dys)
                            djs = sorted((q + dx - s) // 2 for dx in dxs)
                            kh, kw = len(dis), len(djs)
                            kk_s = jnp.zeros((kh, kw, ci, kk.shape[3]),
                                             kk.dtype)
                            for a, dy in enumerate(sorted(dys,
                                                   key=lambda d:
                                                   (p + d - r) // 2)):
                                for b_, dx in enumerate(sorted(dxs,
                                                       key=lambda d:
                                                       (q + d - s) // 2)):
                                    kk_s = kk_s.at[a, b_].set(
                                        kk[dy + 1, dx + 1])
                            pad_h = (max(0, -dis[0]), max(0, dis[-1]))
                            pad_w = (max(0, -djs[0]), max(0, djs[-1]))
                            y = conv_pq(halves_in[(r, s)], kk_s,
                                        pad_h, pad_w)
                            acc = y if acc is None else acc + y
                    outs.append(acc)
            return jnp.concatenate(outs, axis=-1)

        @jax.jit
        def split16_step(xx, kk):
            y = split16(xx, kk)
            return xx + (y.mean() * 0).astype(xx.dtype), y

        # --- 4-conv (2,2,4I,O) decomposition ---------------------------
        # one conv per output phase (p, q): row taps di in {-1,0} (p=0)
        # or {0,1} (p=1), same for columns — a (2,2) window over ALL 4I
        # packed channels. 9 of 16 tap-slots are nonzero -> 1.78x MACs
        # (vs 2.67x for the dense 2-conv form), still 4I-channel-wide
        # contractions.
        def split4_kernels(kk):
            ci, co = kk.shape[2], kk.shape[3]
            kers = []
            for p in (0, 1):
                for q in (0, 1):
                    k = jnp.zeros((2, 2, 4 * ci, co), kk.dtype)
                    for dy in (-1, 0, 1):
                        r = (p + dy) % 2
                        di = (p + dy - r) // 2
                        ki = di + 1 if p == 0 else di
                        for dx in (-1, 0, 1):
                            s = (q + dx) % 2
                            dj = (q + dx - s) // 2
                            kj = dj + 1 if q == 0 else dj
                            blk = 2 * r + s
                            k = k.at[ki, kj,
                                     blk * ci:(blk + 1) * ci].add(
                                kk[dy + 1, dx + 1])
                    kers.append(k)
            return kers

        def split4(xx, kk):
            kers = split4_kernels(kk)
            outs = []
            for idx, (p, q) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
                pad_h = (1, 0) if p == 0 else (0, 1)
                pad_w = (1, 0) if q == 0 else (0, 1)
                outs.append(conv_pq(xx, kers[idx], pad_h, pad_w))
            return jnp.concatenate(outs, axis=-1)

        @jax.jit
        def split4_step(xx, kk):
            y = split4(xx, kk)
            return xx + (y.mean() * 0).astype(xx.dtype), y

        # --- single padded (2,2,4I,4O) conv + shifted slices -----------
        # all four output phases share one conv over the (H+2, W+2)
        # zero-padded input: phase (p, q) is the output shifted by
        # (p, q). One big MXU-friendly conv (1.78x MACs), then four
        # slice+concat passes (one relayout).
        def splitpad(xx, kk):
            kers = split4_kernels(kk)
            kbig = jnp.concatenate(kers, axis=-1)  # (2,2,4I,4O)
            xp = jnp.pad(xx, ((0, 0), (1, 1), (1, 1), (0, 0)))
            y = jax.lax.conv_general_dilated(
                xp, kbig, (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            # y: (B, H+1, W+1, 4O); phase (p,q) lives at y[p:p+H, q:q+W]
            h, w = xx.shape[1], xx.shape[2]
            co = kk.shape[3]
            return jnp.concatenate(
                [y[:, p:p + h, q:q + w, (2 * p + q) * co:
                   (2 * p + q + 1) * co]
                 for p, q in ((0, 0), (0, 1), (1, 0), (1, 1))], axis=-1)

        @jax.jit
        def splitpad_step(xx, kk):
            y = splitpad(xx, kk)
            return xx + (y.mean() * 0).astype(xx.dtype), y

        # correctness vs dense (bf16 tolerance) — jitted: eager ops each
        # compile a one-off remote executable through the tunnel
        @jax.jit
        def check(xx, kk):
            yd = phase_conv3x3(xx, kk)
            errs = []
            for form in (split16, split4, splitpad):
                ys = form(xx, kk)
                errs.append(jnp.max(jnp.abs(yd.astype(jnp.float32) -
                                            ys.astype(jnp.float32))))
            return jnp.stack(errs)

        errs = [float(e) for e in check(x[:1], k3)]
        print(f"maxerr vs dense (split16/split4/splitpad): "
              f"{errs[0]:.4g} {errs[1]:.4g} {errs[2]:.4g}", flush=True)

        t = chain_time(split16_step, (x, k3))
        print(f"split 16-conv           {t * 1e3:7.2f} ms "
              f"(true-mxu {floor / t * 100:5.1f}%)", flush=True)
        t = chain_time(split4_step, (x, k3))
        print(f"split 4-conv (2,2)      {t * 1e3:7.2f} ms "
              f"(true-mxu {floor / t * 100:5.1f}%)", flush=True)
        t = chain_time(splitpad_step, (x, k3))
        print(f"padded 1-conv (2,2,4O)  {t * 1e3:7.2f} ms "
              f"(true-mxu {floor / t * 100:5.1f}%)", flush=True)


if __name__ == "__main__":
    main()
