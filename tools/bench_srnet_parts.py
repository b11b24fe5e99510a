#!/usr/bin/env python
"""Attribute the SR net's time to its architectural parts at real shapes.

Times, as separate chained jit programs (batch 16, 8 slots, bf16):
  front    — encoder/decoder conv chain: first_* + body_* (32x512 -> s32)
  to256    — the prior32 SNStack (B*S, 32, 32, 512) -> 256
  sft32    — SFTFusion at the 32-high scale (canvas 32 x 512)
  up64     — up_a + up_res + up_b chain at 64 x 1024
  sft64    — SFTFusion at the 64-high scale (canvas 64 x 1024)
  final    — final_a/final_b/final_res/final_out chain to 128 x 2048

Each line also prints the stage's MXU FLOP floor (conv FLOPs at the v5e
197 TFLOP/s bf16 peak) so the utilization gap is visible per part.
Set MARCONET_PALLAS_SFT=1 to time the SFT stages with the opt-in Pallas
write-back kernel instead of the default selection-matmul write-back.
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
          f"   mxu {util:5.1f}%")


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from marconet_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    from marconet_tpu.models.srnet import SFTFusion, SNStack
    from marconet_tpu.ops.layers import ResTextBlockV2, SNConv, leaky_relu
    from marconet_tpu.ops.resize import upsample2x_bilinear

    B = int(os.environ.get("BENCH_BATCH", "16"))
    S = int(os.environ.get("BENCH_SLOTS", "8"))
    d = 256
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    cast = lambda t: jax.tree.map(
        lambda x: x.astype(dt) if hasattr(x, "dtype") and
        x.dtype == jnp.float32 else x, t)

    def mk(shape, scale=.3):
        return jnp.asarray(rng.standard_normal(shape) * scale, dt)

    locs = np.zeros((B, 2 * S), np.float32)
    locs[:, 0::2] = 0.06 + 0.11 * np.arange(S)
    locs[:, 1::2] = 0.03
    locs = jnp.asarray(locs)
    mask = jnp.ones((B, S), jnp.float32)

    # ---- front: encoder/decoder chain -------------------------------------
    class Front(nn.Module):
        @nn.compact
        def __call__(self, lq):
            sn = lambda f, s=(1, 1), n="": SNConv(f, strides=s, dtype=dt,
                                                  name=n)
            f32 = leaky_relu(sn(d // 4, n="first_32")(lq))
            f16 = leaky_relu(sn(d // 2, (2, 2), "first_16")(f32))
            f8 = sn(d, n="first_8b")(
                leaky_relu(sn(d, (2, 2), "first_8a")(f16)))
            s16 = sn(d, n="body_16b")(leaky_relu(sn(d, n="body_16a")(
                jnp.concatenate([upsample2x_bilinear(f8), f16], axis=-1))))
            s32 = sn(d, n="body_32b")(leaky_relu(sn(d, n="body_32a")(
                jnp.concatenate([upsample2x_bilinear(s16), f32], axis=-1))))
            return s32

    lq = mk((B, 32, 512, 3), 1.0)
    front = Front()
    pf = cast(front.init(jax.random.PRNGKey(0), lq))

    @jax.jit
    def front_step(x):
        out = front.apply(pf, x)
        return x + (out.mean() * 0).astype(x.dtype), out

    # per-crop conv GFLOPs (3x3 unless noted)
    g_front = (32 * 512 * 9 * 3 * 64 + 16 * 256 * 9 * 64 * 128 +
               8 * 128 * 9 * 128 * 256 + 8 * 128 * 9 * 256 * 256 +
               16 * 256 * 9 * 512 * 256 + 16 * 256 * 9 * 256 * 256 +
               32 * 512 * 9 * 512 * 256 + 32 * 512 * 9 * 256 * 256
               ) * 2 / 1e9
    report("front", chain_time(front_step, (lq,)), g_front * B)

    # ---- to256 ------------------------------------------------------------
    p32raw = mk((B * S, 32, 32, 512))
    to256 = SNStack(d, dtype=dt)
    pt = cast(to256.init(jax.random.PRNGKey(1), p32raw))

    @jax.jit
    def to256_step(x):
        out = to256.apply(pt, x)
        return x + (out.mean() * 0).astype(x.dtype), out

    g_to256 = (32 * 32 * 9 * 512 * 256 + 32 * 32 * 9 * 256 * 256) \
        * 2 * S / 1e9
    report("to256", chain_time(to256_step, (p32raw,)), g_to256 * B)

    # ---- sft32 ------------------------------------------------------------
    c32 = mk((B, 32, 512, d))
    pr32 = mk((B, S, 32, 32, d))
    sft32 = SFTFusion(half_width=16, features=d, dtype=dt)
    ps32 = cast(sft32.init(jax.random.PRNGKey(2), c32, pr32, locs, mask))

    @jax.jit
    def sft32_step(c, pr):
        out = sft32.apply(ps32, c, pr, locs, mask)
        return c + (out.mean() * 0).astype(c.dtype), out

    def g_sft(hw):
        area = (2 * hw) * (2 * hw)
        return (area * 9 * 512 * 256 + area * 9 * 256 * 256 +
                area * 512 * 256 +                       # 1x1 skip
                4 * area * 9 * 256 * 256) * 2 * S / 1e9  # scale+shift

    report("sft32", chain_time(sft32_step, (c32, pr32)), g_sft(16) * B)

    # ---- up64 chain -------------------------------------------------------
    class Up64(nn.Module):
        @nn.compact
        def __call__(self, s32):
            x = leaky_relu(SNConv(d, dtype=dt, name="up_a")(
                upsample2x_bilinear(s32)))
            x = ResTextBlockV2(d, dtype=dt, name="up_res")(x)
            return SNConv(d, dtype=dt, name="up_b")(x)

    up64 = Up64()
    pu = cast(up64.init(jax.random.PRNGKey(3), c32))

    @jax.jit
    def up64_step(x):
        out = up64.apply(pu, x)
        return x + (out.mean() * 0).astype(x.dtype), out

    g_up = 64 * 1024 * 9 * 256 * 256 * 4 * 2 / 1e9
    report("up64", chain_time(up64_step, (c32,)), g_up * B)

    # ---- sft64 ------------------------------------------------------------
    c64 = mk((B, 64, 1024, d))
    pr64 = mk((B, S, 64, 64, d))
    sft64 = SFTFusion(half_width=32, features=d, dtype=dt)
    ps64 = cast(sft64.init(jax.random.PRNGKey(4), c64, pr64, locs, mask))

    @jax.jit
    def sft64_step(c, pr):
        out = sft64.apply(ps64, c, pr, locs, mask)
        return c + (out.mean() * 0).astype(c.dtype), out

    report("sft64", chain_time(sft64_step, (c64, pr64)), g_sft(32) * B)

    # ---- final chain ------------------------------------------------------
    class Final(nn.Module):
        """Mirrors StructurePriorSRNet's tail, including the backend-
        resolved layout (wfold on TPU since round 4): the same
        ``_tail_form_default`` the model reads, so the 'final' row
        measures the DEPLOYED form. ``MARCONET_TAIL=plain|phase|wfold``
        forces; ``MARCONET_FINAL_UNFUSED=1`` keeps the round-1 separate
        upsample+conv chain for comparison."""

        @nn.compact
        def __call__(self, s64):
            from marconet_tpu.models.srnet import _tail_form_default

            x = leaky_relu(SNConv(d // 2, dtype=dt, name="final_a")(s64))
            if os.environ.get("MARCONET_FINAL_UNFUSED") == "1":
                x = leaky_relu(SNConv(d // 4, dtype=dt, name="final_b")(
                    upsample2x_bilinear(x)))
                x = ResTextBlockV2(d // 4, dtype=dt, name="final_res")(x)
                return jnp.tanh(SNConv(3, dtype=dt, name="final_out")(x))
            tail = _tail_form_default()
            if tail == "phase":
                from marconet_tpu.ops.phase import phase_unpack
                x = leaky_relu(SNConv(d // 4, dtype=dt, pre_upsample=True,
                                      phase_output=True, name="final_b")(x))
                x = ResTextBlockV2(d // 4, dtype=dt, phase=True,
                                   name="final_res")(x)
                x = SNConv(3, dtype=dt, phase_input=True,
                           name="final_out")(x)
                return phase_unpack(jnp.tanh(x))
            if tail == "wfold":
                from marconet_tpu.ops.widthfold import wunfold
                x = leaky_relu(SNConv(d // 4, dtype=dt, pre_upsample=True,
                                      wfold_output=True, name="final_b")(x))
                x = ResTextBlockV2(d // 4, dtype=dt, wfold=True,
                                   name="final_res")(x)
                x = SNConv(3, dtype=dt, wfold_input=True,
                           name="final_out")(x)
                return wunfold(jnp.tanh(x), 2)
            x = leaky_relu(SNConv(d // 4, dtype=dt, pre_upsample=True,
                                  name="final_b")(x))
            x = ResTextBlockV2(d // 4, dtype=dt, name="final_res")(x)
            return jnp.tanh(SNConv(3, dtype=dt, name="final_out")(x))

    fin = Final()
    pfin = cast(fin.init(jax.random.PRNGKey(5), c64))

    @jax.jit
    def fin_step(x):
        out = fin.apply(pfin, x)
        return x + (out.mean() * 0).astype(x.dtype), out

    g_fin = (64 * 1024 * 9 * 256 * 128 + 128 * 2048 * 9 * 128 * 64 +
             128 * 2048 * 9 * 64 * 64 * 2 + 128 * 2048 * 9 * 64 * 3
             ) * 2 / 1e9
    report("final", chain_time(fin_step, (c64,)), g_fin * B)


if __name__ == "__main__":
    main()
