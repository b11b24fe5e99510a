#!/usr/bin/env python
"""Attribute the encoder's time to its architectural parts at real shapes.

The encoder measures ~14.9 ms/batch vs an 8.4 ms conv-FLOP floor
(BENCH_NOTES.md); its FLOPs concentrate in ResNet stages 4-5 (256/512 ch
at 8 x 512) while the early stages are tiny — this tool splits the gap.

Times, as separate chained jit programs (batch 16, bf16):
  stem     — conv1 + stage1 (32 ch, 32x512 -> 16x512)
  stage2   — 4 blocks, 64 ch @ 16x512
  stage3   — 6 blocks, 128 ch (stride (2,1)) @ 8x512
  stage4   — 6 blocks, 256 ch @ 8x512
  stage5   — 3 blocks, 512 ch @ 8x512
  vit      — patchify + trunk + 3 branches + heads

Each line prints the stage's conv/matmul FLOP floor at the v5e
197 TFLOP/s bf16 peak. Timings carry ~1-3.5 ms remote-dispatch overhead
per program (axon tunnel, BENCH_NOTES.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK = 197e12


def chain_time(step, args0, iters=10):
    x, keep = step(*args0)
    float(keep.mean())
    t0 = time.perf_counter()
    a = args0
    for _ in range(iters):
        x, keep = step(*a)
        a = (x,) + a[1:]
    float(keep.mean())
    return (time.perf_counter() - t0) / iters


def report(name, t, gflop_batch):
    floor = gflop_batch * 1e9 / PEAK
    util = floor / t * 100
    print(f"{name:8s} {t * 1e3:8.2f} ms/batch   floor {floor * 1e3:7.2f} ms"
          f"   mxu {util:5.1f}%", flush=True)


def block_gflops(b, h, w, cin, c, strided):
    """BasicBlock conv FLOPs (GFLOP): 1x1 cin->c, 3x3 c->c (strided),
    plus the 1x1 projection when shape changes."""
    ho, wo = (h // 2, w) if strided else (h, w)
    g = b * h * w * cin * c * 2                 # 1x1
    g += b * ho * wo * 9 * c * c * 2            # 3x3
    if strided or cin != c:
        g += b * ho * wo * cin * c * 2          # projection
    return g / 1e9


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from marconet_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    from marconet_tpu.models.encoder import (BasicBlock, ResNet45,
                                             TextViTHead)

    B = int(os.environ.get("BENCH_BATCH", "16"))
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def bf16(tree):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)

    def time_mod(name, mod, x_shape, gflop):
        x = jnp.asarray(rng.standard_normal(x_shape) * 0.3, dt)
        params = bf16(mod.init(key, x))

        @jax.jit
        def step(xx, p):
            y = mod.apply(p, xx)
            if isinstance(y, tuple):
                y = y[0]
            return xx + (y.mean() * 0).astype(xx.dtype), y

        t = chain_time(step, (x, params))
        report(name, t, gflop)

    # MARCONET_ENC_FOLD applies the width-folded layout to the stages it
    # would cover in the real model (folded channels <= 256); floors are
    # scaled by the fold's MAC inflation (dense embed kernel: f x)
    fold = int(os.environ.get("MARCONET_ENC_FOLD", "1"))

    g = B * 32 * 512 * 9 * 3 * 32 * 2 / 1e9
    g += block_gflops(B, 32, 512, 32, 32, True)
    g += 2 * block_gflops(B, 16, 512, 32, 32, False)
    time_mod("stem", ResNet45(stage_blocks=(3,), stage_features=(32,),
                              stage_strides=((2, 1),), fold=fold, dtype=dt),
             (B, 32, 512, 3), g * fold)

    def mid_stage(name, blocks, cin, c, h, strided):
        f = fold if c * fold <= 256 else 1

        class Seq(nn.Module):
            @nn.compact
            def __call__(self, x):
                from marconet_tpu.ops.widthfold import wfold, wunfold
                if f > 1:
                    x = wfold(x, f)
                for i in range(blocks):
                    x = BasicBlock(c, strides=(2, 1) if strided and i == 0
                                   else (1, 1), fold=f, dtype=dt,
                                   name=f"b{i}")(x)
                return wunfold(x, f) if f > 1 else x

        ho = h // 2 if strided else h
        g = block_gflops(B, h, 512, cin, c, strided)
        g += (blocks - 1) * block_gflops(B, ho, 512, c, c, False)
        time_mod(name, Seq(), (B, h, 512, cin), g * f)

    mid_stage("stage2", 4, 32, 64, 16, False)
    mid_stage("stage3", 6, 64, 128, 16, True)
    mid_stage("stage4", 6, 128, 256, 8, False)
    mid_stage("stage5", 3, 256, 512, 8, False)

    # ViT head: matmul floor ~ params x tokens x 2 (dominated by dense
    # layers; attention matrices are 64x64 and negligible)
    head = TextViTHead(dtype=dt)
    xf = jnp.asarray(rng.standard_normal((B, 8, 512, 512)) * 0.3, dt)
    pv = bf16(head.init(key, xf))
    nparams = sum(int(np.prod(v.shape))
                  for v in jax.tree.leaves(pv["params"]))
    # tokens: 64 through trunk/cls/w, 16 through locs branch; approximate
    # with 64 everywhere (upper bound)
    g_vit = nparams * 64 * B * 2 / 1e9

    @jax.jit
    def vstep(xx, p):
        logits, locs, w = head.apply(p, xx)
        return xx + (logits.mean() * 0).astype(xx.dtype), logits

    t = chain_time(vstep, (xf, pv))
    report("vit", t, g_vit)


if __name__ == "__main__":
    main()
