#!/usr/bin/env python
"""Attribute the structure-prior generator's time to its parts.

Times, as separate chained jit programs (batch = BENCH_BATCH*BENCH_SLOTS
glyphs, bf16): the style MLP, the codebook lookup, each resolution's
StyledConv pair (with its upsample), and the ToRGB skip chain — against
each part's conv/matmul FLOP floor at the v5e bf16 peak.
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


def report(name, t, gflop):
    floor = gflop * 1e9 / PEAK
    util = floor / t * 100 if gflop else 0.0
    print(f"{name:14s} {t * 1e3:8.2f} ms   floor {floor * 1e3:7.2f} ms"
          f"   mxu {util:5.1f}%")


def main():
    import jax
    import jax.numpy as jnp

    from marconet_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    from marconet_tpu.models.prior import (CharCodebook, StyleMLP,
                                           _CHANNELS)
    from marconet_tpu.ops.modconv import StyledConv, ToRGB

    B = int(os.environ.get("BENCH_BATCH", "16"))
    S = int(os.environ.get("BENCH_SLOTS", "8"))
    G = B * S
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    cast = lambda t: jax.tree.map(
        lambda x: x.astype(dt) if hasattr(x, "dtype") and
        x.dtype == jnp.float32 else x, t)

    def mk(shape, scale=.3):
        return jnp.asarray(rng.standard_normal(shape) * scale, dt)

    # ---- style MLP --------------------------------------------------------
    z = mk((G, 512), 1.0)
    mlp = StyleMLP(dtype=dt)
    pm = cast(mlp.init(jax.random.PRNGKey(0), z))

    @jax.jit
    def mlp_step(x):
        out = mlp.apply(pm, x)
        return x + (out.mean() * 0).astype(x.dtype), out

    report("style_mlp", chain_time(mlp_step, (z,)),
           8 * G * 512 * 512 * 2 / 1e9)

    # ---- codebook ---------------------------------------------------------
    labels = jnp.asarray(rng.integers(0, 6735, (G,)), jnp.int32)
    cb = CharCodebook()
    pc = cb.init(jax.random.PRNGKey(1), labels[:, None])

    @jax.jit
    def cb_step(l):
        out = cb.apply(pc, l[:, None]).astype(dt)
        return l, out

    t = chain_time(cb_step, (labels,))
    report("codebook", t, 0)

    # ---- per-resolution StyledConv pairs ----------------------------------
    w = mk((G, 512), 1.0)
    res, cin = 4, _CHANNELS[4]
    x = mk((G, 4, 4, cin))
    total_floor = 0.0
    while res < 128:
        res *= 2
        ch = _CHANNELS[res]
        up = StyledConv(ch, upsample=True, dtype=dt, name="up")
        kp = StyledConv(ch, dtype=dt, name="keep")
        pu = cast(up.init(jax.random.PRNGKey(res), x, w))
        xin = mk((G, res, res, ch))
        pk = cast(kp.init(jax.random.PRNGKey(res + 1), xin, w))

        @jax.jit
        def pair_step(xx, up=up, kp=kp, pu=pu, pk=pk):
            y = up.apply(pu, xx, w)
            y = kp.apply(pk, y, w)
            return xx + (y.mean() * 0).astype(xx.dtype), y

        gflop = (res * res * 9 * cin * ch + res * res * 9 * ch * ch) \
            * 2 * G / 1e9
        total_floor += gflop
        report(f"conv_{res}", chain_time(pair_step, (x,)), gflop)
        x = mk((G, res, res, ch))
        cin = ch

    # ---- ToRGB chain ------------------------------------------------------
    class RGBs:
        pass

    import flax.linen as nn

    class RGBChain(nn.Module):
        @nn.compact
        def __call__(self, feats, w):
            skip = None
            for i, f in enumerate(feats):
                skip = ToRGB(upsample=(skip is not None), dtype=dt,
                             name=f"rgb_{i}")(f, w, skip)
            return skip

    feats = [mk((G, r, r, _CHANNELS[r]))
             for r in (4, 8, 16, 32, 64, 128)]
    rc = RGBChain()
    pr = cast(rc.init(jax.random.PRNGKey(9), feats, w))

    @jax.jit
    def rgb_step(f0, *rest):
        out = rc.apply(pr, (f0,) + rest, w)
        return f0 + (out.mean() * 0).astype(f0.dtype), out

    report("to_rgb_chain", chain_time(rgb_step, tuple(feats)), 0)


if __name__ == "__main__":
    main()
