#!/usr/bin/env python
"""Per-part timing of the text context encoder on the TPU.

The encoder measures ~15 ms/batch against an 8.4 ms conv FLOP floor
(BENCH_NOTES.md). This splits it: ResNet-45 backbone (cumulative stage
prefixes — the 32/64-ch early stages underfill the MXU contraction) vs
the remainder (ViT head + branches: 64 tokens x 512d, tiny FLOPs,
small-matmul/latency-bound).

Each chained program carries ~1-3.5 ms of remote-dispatch overhead
(BENCH_NOTES.md); compare relative numbers. BENCH_BATCH overrides the
batch (default 16).
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
    mxu = floor / t * 100 if t > 0 else 0
    print(f"{name:12s} {t * 1e3:8.2f} ms   floor {floor * 1e3:7.2f} ms"
          f"   mxu {mxu:5.1f}%", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from marconet_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    from marconet_tpu.models.encoder import ResNet45, TextContextEncoder

    B = int(os.environ.get("BENCH_BATCH", "16"))
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    lq = jnp.asarray(rng.standard_normal((B, 32, 512, 3)) * 0.3, dt)

    # ---- whole encoder ----------------------------------------------------
    enc = TextContextEncoder(dtype=dt)
    pe = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 512, 3), dt))

    @jax.jit
    def enc_step(x):
        logits, locs, w = enc.apply(pe, x)
        return x + (w.mean() * 0).astype(x.dtype), w

    report("encoder", chain_time(enc_step, (lq,)), 103.8 / 16 * B)

    # ---- ResNet-45 backbone + cumulative stage prefixes -------------------
    bb = ResNet45(dtype=dt)
    pb = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 512, 3), dt))

    def conv_gf(h, blocks, cin, cf):
        """Per-sample conv GFLOPs of one stage (1x1 + 3x3 per block,
        1x1 projection where the shape changes)."""
        g = 0.0
        for bi in range(blocks):
            ci = cin if bi == 0 else cf
            g += h * 512 * (ci * cf + 9 * cf * cf) * 2
            if ci != cf or bi == 0:
                g += h * 512 * ci * cf * 2  # projection skip (stride/chan)
        return g / 1e9

    g_stem = 32 * 512 * 9 * 3 * 32 * 2 / 1e9
    g_stages = [conv_gf(16, 3, 32, 32), conv_gf(16, 4, 32, 64),
                conv_gf(8, 6, 64, 128), conv_gf(8, 6, 128, 256),
                conv_gf(8, 3, 256, 512)]

    @jax.jit
    def bb_step(x):
        y = bb.apply(pb, x)
        return x + (y.mean() * 0).astype(x.dtype), y

    report("resnet45", chain_time(bb_step, (lq,)),
           (g_stem + sum(g_stages)) * B)

    for upto in (1, 2, 3, 4):
        part = ResNet45(dtype=dt,
                        stage_blocks=(3, 4, 6, 6, 3)[:upto],
                        stage_features=(32, 64, 128, 256, 512)[:upto],
                        stage_strides=((2, 1), (1, 1), (2, 1), (1, 1),
                                       (1, 1))[:upto])
        sub = {"params": {k: v for k, v in pb["params"].items()
                          if k == "conv1" or any(
                              k.startswith(f"layer{i + 1}_")
                              for i in range(upto))}}

        @jax.jit
        def part_step(x, part=part, sub=sub):
            y = part.apply(sub, x)
            return x + (y.mean() * 0).astype(x.dtype), y

        report(f"stages<={upto}", chain_time(part_step, (lq,)),
               (g_stem + sum(g_stages[:upto])) * B)

    print("vit+branches = encoder - resnet45 (difference of the rows above)",
          flush=True)


if __name__ == "__main__":
    main()
