#!/usr/bin/env python
"""Write-back formulations at the SFT shapes (round 5).

The default write-back turns the last-writer-wins window overlap into a
one-hot selection einsum on the MXU (``models/srnet.py``). At sft64
that contraction is ~550 GFLOP/batch of *artificial* work standing in
for a 537 MB data movement — this probe asks whether XLA's row gather
(``take_along_axis`` with one (H*C)-contiguous row per output column)
beats it now that rows are large enough to be DMA-shaped (the round-1
"general gather 35x slower" result was per-element, not per-row).

Forms (all same math; overlap winner precomputed identically):
  einsum_direct — the TPU default ('bwnv,bnhvc->bhwc');
  einsum_flat   — the pre-transpose flattened contraction;
  take_rows     — winner/col -> flat row index, one take_along_axis.

Env: PROBE_ITERS (default 30).
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

    iters = int(os.environ.get("PROBE_ITERS", "30"))
    rng = np.random.default_rng(0)

    # The *_x2 rows are the original round-5 probe shapes (double the
    # deployed window width — the most gather-favorable granularity);
    # the *_real rows are the model's deployed shapes (win = 2*hw with
    # hw 32/16, models/srnet.py), where the per-scale default choice is
    # actually decided.
    for label, (b, n, h, win, c, width) in (
            ("sft64_real", (16, 8, 64, 64, 256, 1024)),
            ("sft32_real", (16, 8, 32, 32, 256, 512)),
            ("sft64_x2", (16, 8, 64, 128, 256, 1024)),
            ("sft32_x2", (16, 8, 32, 64, 256, 512))):
        out_win = jnp.asarray(
            rng.standard_normal((b, n, h, win, c)) * 0.1, jnp.bfloat16)
        canvas = jnp.asarray(
            rng.standard_normal((b, h, width, c)) * 0.1, jnp.bfloat16)
        hw = win // 2
        centers = (0.06 + 0.115 * np.arange(n))[None, :] * np.ones((b, 1))
        x1 = np.clip((centers * width - hw).astype(np.int32), 0,
                     width - 1)
        L = np.minimum(width - x1, win)
        x1c = np.minimum(x1, width - win)
        x1, L, x1c = map(jnp.asarray, (x1, L, x1c))
        mask = jnp.ones((b, n), jnp.bfloat16)

        def winner_of(x1, L, mask):
            xcols = jnp.arange(width)[None, None, :]
            covers = ((xcols >= x1[:, :, None]) &
                      (xcols < (x1 + L)[:, :, None]) &
                      (mask[:, :, None] > 0))
            rank = jnp.where(covers, jnp.arange(n)[None, :, None], -1)
            return rank.max(axis=1)                       # (B, W)

        def sel_of(x1c, winner):
            sel_slot = (winner[:, :, None] == jnp.arange(n)[None, None, :])
            rel = (jnp.arange(width)[None, :, None] - x1c[:, None, :])
            sel_col = (rel[..., None] ==
                       jnp.arange(win)[None, None, None, :])
            return (sel_slot[..., None] & sel_col)        # (B,W,N,win)

        def einsum_direct(canvas, out_win):
            w = winner_of(x1, L, mask)
            sel = sel_of(x1c, w).astype(canvas.dtype)
            return canvas + jnp.einsum(
                "bwnv,bnhvc->bhwc", sel, out_win,
                preferred_element_type=canvas.dtype)

        def einsum_flat(canvas, out_win):
            w = winner_of(x1, L, mask)
            sel = sel_of(x1c, w).astype(canvas.dtype)
            flat = out_win.transpose(0, 1, 3, 2, 4).reshape(b, n * win,
                                                            h * c)
            res = jnp.einsum("bwk,bkf->bwf",
                             sel.reshape(b, width, n * win), flat,
                             preferred_element_type=canvas.dtype)
            return canvas + res.reshape(b, width, h, c).transpose(
                0, 2, 1, 3)

        def take_rows(canvas, out_win):
            w = winner_of(x1, L, mask)                      # (B, W)
            # flat row index: slot*win + (col - x1c[slot]); uncovered
            # columns -> row 0 with a zero multiplier
            xc = jnp.take_along_axis(x1c, jnp.maximum(w, 0), axis=1)
            v = jnp.arange(width)[None, :] - xc             # (B, W)
            idx = jnp.maximum(w, 0) * win + jnp.clip(v, 0, win - 1)
            flat = out_win.transpose(0, 1, 3, 2, 4).reshape(b, n * win,
                                                            h * c)
            res = jnp.take_along_axis(flat, idx[:, :, None], axis=1)
            live = ((w >= 0) & (v >= 0) & (v < win))[:, :, None]
            res = jnp.where(live, res, 0).reshape(b, width, h, c)
            return canvas + res.transpose(0, 2, 1, 3)

        ref = None
        for name, fn in (("einsum_direct", einsum_direct),
                         ("einsum_flat", einsum_flat),
                         ("take_rows", take_rows)):
            @jax.jit
            def step(cv, ow, fn=fn):
                out = fn(cv, ow)
                return cv + (out.mean() * 0).astype(cv.dtype), out

            cv, out = step(canvas, out_win)
            got = np.asarray(out, np.float32)
            if ref is None:
                ref = got
            else:
                np.testing.assert_allclose(got, ref, atol=1e-2)
            t0 = time.perf_counter()
            x = canvas
            for _ in range(iters):
                x, out = step(x, out_win)
            float(jnp.mean(out))
            dt = (time.perf_counter() - t0) / iters * 1e3
            print(f"{label} {name:14s} {dt:7.2f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
