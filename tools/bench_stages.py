#!/usr/bin/env python
"""Per-stage throughput breakdown: encoder / prior generator / SR net.

Times each stage as its own chained jit program (remote-execution-safe
sync via host transfers), batch 16, slots 8, bf16.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def chain_time(step, args0, iters=10):
    import jax

    x, keep = step(*args0)
    float(keep.mean())
    t0 = time.perf_counter()
    x_args = args0
    for _ in range(iters):
        x, keep = step(*x_args)
        x_args = (x_args[0], x) + x_args[2:]
    float(keep.mean())
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from marconet_tpu.models.encoder import TextContextEncoder
    from marconet_tpu.models.prior import StructurePriorGenerator
    from marconet_tpu.models.srnet import StructurePriorSRNet
    from marconet_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    B = int(os.environ.get("BENCH_BATCH", "16"))
    S = int(os.environ.get("BENCH_SLOTS", "8"))
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    cast = lambda t: jax.tree.map(
        lambda x: x.astype(dt) if hasattr(x, "dtype") and
        x.dtype == jnp.float32 else x, t)

    lq = jnp.asarray(rng.uniform(-1, 1, (B, 32, 512, 3)), dt)

    enc = TextContextEncoder(dtype=dt)
    p_enc = cast(enc.init(jax.random.PRNGKey(0), lq))

    @jax.jit
    def enc_step(p, x):
        logits, locs, w = enc.apply(p, x)
        return x + (w.mean() * 0).astype(x.dtype), logits

    t_enc = chain_time(enc_step, (p_enc, lq))
    print(f"encoder:   {t_enc * 1e3:8.2f} ms/batch "
          f"({B / t_enc:7.1f} crops/s)")

    gen = StructurePriorGenerator(dtype=dt)
    styles = jnp.asarray(rng.standard_normal((B * S, 512)), dt)
    labels = jnp.asarray(rng.integers(0, 6735, (B * S,)), jnp.int32)
    p_gen = cast(gen.init(jax.random.PRNGKey(1), styles, labels))

    @jax.jit
    def gen_step(p, s):
        out = gen.apply(p, s, labels)
        return s + (out.image.mean() * 0).astype(s.dtype), out.image

    t_gen = chain_time(gen_step, (p_gen, styles))
    print(f"generator: {t_gen * 1e3:8.2f} ms/batch "
          f"({B / t_gen:7.1f} crops/s)  [{B * S} glyphs]")

    srn = StructurePriorSRNet(dtype=dt)
    p64 = jnp.asarray(rng.standard_normal((B, S, 64, 64, 256)) * .3, dt)
    p32 = jnp.asarray(rng.standard_normal((B, S, 32, 32, 512)) * .3, dt)
    locs = np.zeros((B, 2 * S), np.float32)
    locs[:, 0::2] = 0.06 + 0.11 * np.arange(S)
    locs[:, 1::2] = 0.03
    locs = jnp.asarray(locs)
    mask = jnp.ones((B, S), jnp.float32)
    p_srn = cast(srn.init(jax.random.PRNGKey(2), lq, p64, p32, locs))

    @jax.jit
    def srn_step(p, x, f64, f32):
        out = srn.apply(p, x, f64, f32, locs, mask)
        return x + (out.mean() * 0).astype(x.dtype), out

    t_srn = chain_time(srn_step, (p_srn, lq, p64, p32))
    print(f"srnet:     {t_srn * 1e3:8.2f} ms/batch "
          f"({B / t_srn:7.1f} crops/s)")

    total = t_enc + t_gen + t_srn
    print(f"sum:       {total * 1e3:8.2f} ms/batch "
          f"({B / total:7.1f} crops/s)")


if __name__ == "__main__":
    main()
