#!/usr/bin/env python
"""Micro-benchmark of the SFT window path's pieces (the SR stage's cost).

NOTE: see tools/bench_srnet_parts.py for whole-part attribution against
FLOP floors; each chained program here carries ~1-3.5 ms of remote
dispatch overhead (BENCH_NOTES.md).

Times, as separate chained jit programs at the bench shapes
(batch 16, 8 slots, 64-high scale unless overridden):
  gather    — window extraction from the padded canvas
  convs     — the fuse/scale/shift conv stacks on pre-formed windows
  adain     — masked AdaIN + the two GroupNorms' moment passes
  writeback — the one-hot winner-selection einsum back to the canvas
  sft       — the full SFTFusion module
  srnet     — the whole SR network (context)

Use to attribute the gap between the SR stage time and its FLOP floor.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def chain_time(step, args0, iters=10):
    # sync via a device-side scalar mean — np.asarray(keep) would drag
    # the full output tensor through the remote tunnel every measurement
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
    import flax.linen as nn

    from marconet_tpu.models.srnet import (SFTFusion, SNStack,
                                           StructurePriorSRNet,
                                           _window_geometry)
    from marconet_tpu.ops.window import gather_windows as _gather_windows
    from marconet_tpu.ops.layers import (ResTextBlockV2,
                                         adaptive_instance_norm,
                                         group_norm)

    B = int(os.environ.get("BENCH_BATCH", "16"))
    S = int(os.environ.get("BENCH_SLOTS", "8"))
    HW = int(os.environ.get("BENCH_HALFWIDTH", "32"))   # 64-high scale
    H = 2 * HW
    WIDTH = 16 * HW                                      # canvas width
    C = 256
    win = 2 * HW
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    canvas = jnp.asarray(rng.standard_normal((B, H, WIDTH, C)) * .3, dt)
    priors = jnp.asarray(rng.standard_normal((B, S, H, win, C)) * .3, dt)
    locs = np.zeros((B, 2 * S), np.float32)
    locs[:, 0::2] = 0.06 + 0.11 * np.arange(S)
    locs[:, 1::2] = 0.03
    locs = jnp.asarray(locs)
    mask = jnp.ones((B, S), jnp.float32)

    x1, L, y1 = _window_geometry(locs, HW, WIDTH)

    # ---- gather ------------------------------------------------------------
    @jax.jit
    def gather_step(c):
        padded = jnp.pad(c, ((0, 0), (0, 0), (0, win), (0, 0)))
        w = _gather_windows(padded, x1, win)
        return c + (w.mean() * 0).astype(c.dtype), w

    t = chain_time(gather_step, (canvas,))
    print(f"gather:    {t * 1e3:8.2f} ms/batch")

    # ---- conv stacks on pre-formed windows ----------------------------------
    windows = jnp.asarray(
        rng.standard_normal((B * S, H, win, 2 * C)) * .3, dt)

    class Stacks(nn.Module):
        @nn.compact
        def __call__(self, w):
            f = ResTextBlockV2(C, dtype=dt, name="fuse")(w)
            sc = SNStack(C, dtype=dt, name="scale")(f)
            sh = SNStack(C, dtype=dt, name="shift")(f)
            return sc + sh

    stacks = Stacks()
    pv = jax.tree.map(
        lambda x: x.astype(dt) if hasattr(x, "dtype") and
        x.dtype == jnp.float32 else x,
        stacks.init(jax.random.PRNGKey(0), windows))

    @jax.jit
    def convs_step(w):
        out = stacks.apply(pv, w)
        return w + (out.mean() * 0).astype(w.dtype), out

    t = chain_time(convs_step, (windows,))
    print(f"convs:     {t * 1e3:8.2f} ms/batch")

    # ---- AdaIN + GN moments --------------------------------------------------
    lq_f = jnp.asarray(rng.standard_normal((B * S, H, win, C)) * .3, dt)
    pr_f = jnp.asarray(rng.standard_normal((B * S, H, win, C)) * .3, dt)
    cols = jnp.arange(win)
    colmask = (cols[None, :] < L.reshape(-1)[:, None]).astype(dt)
    m = colmask[:, None, :, None]
    gamma = jnp.ones((C,), jnp.float32)
    beta = jnp.zeros((C,), jnp.float32)

    @jax.jit
    def adain_step(a, b_):
        o = adaptive_instance_norm(a, b_, prior_mask=m, lq_mask=m)
        o = group_norm(o, gamma, beta, C // 32, mask=m)
        return a + (o.mean() * 0).astype(a.dtype), o

    t = chain_time(adain_step, (pr_f, lq_f))
    print(f"adain+gn:  {t * 1e3:8.2f} ms/batch")

    # ---- write-back ----------------------------------------------------------
    out_win = jnp.asarray(
        rng.standard_normal((B, S, H, win, C)) * .3, dt)

    @jax.jit
    def wb_step(ow, c):
        xcols = jnp.arange(WIDTH)[None, None, :]
        covers = ((xcols >= x1[:, :, None]) &
                  (xcols < (x1 + L)[:, :, None]) &
                  (mask[:, :, None] > 0))
        slot_rank = jnp.where(covers, jnp.arange(S)[None, :, None], -1)
        winner = slot_rank.max(axis=1)
        sel_slot = winner[:, :, None] == jnp.arange(S)[None, None, :]
        rel = jnp.arange(WIDTH)[None, :, None] - x1[:, None, :]
        sel_col = rel[..., None] == jnp.arange(win)[None, None, None, :]
        sel = (sel_slot[..., None] & sel_col).astype(c.dtype)
        flat = ow.transpose(0, 1, 3, 2, 4).reshape(B, S * win, H * C)
        res = jnp.einsum("bwk,bkf->bwf",
                         sel.reshape(B, WIDTH, S * win), flat,
                         preferred_element_type=c.dtype)
        out = c + res.reshape(B, WIDTH, H, C).transpose(0, 2, 1, 3)
        return ow + (out.mean() * 0).astype(ow.dtype), out

    t = chain_time(wb_step, (out_win, canvas))
    print(f"writeback: {t * 1e3:8.2f} ms/batch")

    # ---- full SFTFusion -------------------------------------------------------
    sft = SFTFusion(half_width=HW, features=C, dtype=dt)
    pr_in = jnp.asarray(rng.standard_normal((B, S, H, win, C)) * .3, dt)
    psft = jax.tree.map(
        lambda x: x.astype(dt) if hasattr(x, "dtype") and
        x.dtype == jnp.float32 else x,
        sft.init(jax.random.PRNGKey(1), canvas, pr_in, locs, mask))

    @jax.jit
    def sft_step(c, pr):
        # priors passed as an argument: a closed-over 134 MB tensor would
        # be embedded in the program and blow the remote-compile limit
        out = sft.apply(psft, c, pr, locs, mask)
        return c + (out.mean() * 0).astype(c.dtype), out

    t = chain_time(sft_step, (canvas, pr_in))
    print(f"sft(full): {t * 1e3:8.2f} ms/batch")


if __name__ == "__main__":
    main()
