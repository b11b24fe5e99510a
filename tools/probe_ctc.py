#!/usr/bin/env python
"""Isolate the encoder-loss gradient pathology (round 5).

``bench_g_parts`` measured the enc part (CTC + localization grads
through the encoder) at ~7 s/iteration against a 15 ms floor while the
neighboring prior part — same encoder forward+backward — ran at
124 ms. This times each enc-loss ingredient's value_and_grad alone at
the training shapes to find which term (optax CTC's scan? the IoU
term? smooth-L1?) the TPU executes pathologically.

Env: PROBE_ITERS (default 20).
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

    from marconet_tpu.alphabet import BLANK_INDEX
    from marconet_tpu.train import losses as L

    iters = int(os.environ.get("PROBE_ITERS", "20"))
    rng = np.random.default_rng(0)
    b, t, c, s = 8, 64, BLANK_INDEX + 1, 16

    logits = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    labels = np.full((b, s), BLANK_INDEX, np.int64)
    labels[:, :8] = rng.integers(0, 6735, (b, 8))
    labels = jnp.asarray(labels)
    locs_lr = jnp.asarray(rng.uniform(0, 1, (b, 2 * s)), jnp.float32)
    gt_lr = jnp.asarray(rng.uniform(0, 1, (b, 2 * s)), jnp.float32)
    valid = jnp.asarray((rng.uniform(0, 1, (b, s)) > 0.3), jnp.float32)

    def ctc(lg):
        return L.ctc_loss(lg, labels)

    def loc(lr):
        pred_cw = L.lr_to_center_width(lr)
        gt_cw = L.lr_to_center_width(gt_lr)
        return (L.smooth_l1_loss(pred_cw[:, 0::2] * 2048.0,
                                 gt_cw[:, 0::2] * 2048.0)
                + L.smooth_l1_loss(lr * 2048.0, gt_lr * 2048.0))

    def iou(lr):
        return L.box_iou_loss(L.lr_to_center_width(lr),
                              L.lr_to_center_width(gt_lr), valid)

    for name, fn, arg in (("ctc", ctc, logits), ("loc", loc, locs_lr),
                          ("iou", iou, locs_lr)):
        g = jax.jit(jax.value_and_grad(fn))
        v, _ = g(arg)
        jax.block_until_ready(v)
        t0 = time.perf_counter()
        for _ in range(iters):
            v, _ = g(arg)
        float(v)
        print(f"{name:4s} grad: {(time.perf_counter() - t0) / iters * 1e3:9.2f} ms",
              flush=True)

    # ---- stage 2: the same losses THROUGH the real encoder ----------------
    # bench_g_parts' enc part (losses(encoder(p, lq))) measured ~19 s
    # against a 15 ms floor, reproducibly, while the identical paths
    # inside the full G phase cost ~none. Bisect: pure encoder f/b, CTC
    # through the encoder, loc terms through the encoder.
    if os.environ.get("PROBE_CTC_ENCODER", "1") != "1":
        return

    import jax.numpy as jnp2  # noqa: F401  (parallel import style)

    from marconet_tpu.models.encoder import TextContextEncoder

    enc = TextContextEncoder(width=1.0, dtype=jnp.bfloat16)
    lq = jnp.asarray(rng.uniform(-1, 1, (b, 32, 512, 3)), jnp.float32)
    variables = jax.jit(enc.init)(jax.random.PRNGKey(0), lq)
    params = variables["params"]

    def pure(p):
        lg, lr, w = enc.apply({"params": p}, lq)
        return (lg.astype(jnp.float32).mean()
                + lr.astype(jnp.float32).mean()
                + w.astype(jnp.float32).mean())

    def ctc_enc(p):
        lg, _, _ = enc.apply({"params": p}, lq)
        return L.ctc_loss(lg, labels)

    def loc_enc(p):
        _, lr, _ = enc.apply({"params": p}, lq)
        return loc(lr) + iou(lr)

    def all_enc(p):
        lg, lr, _ = enc.apply({"params": p}, lq)
        return L.ctc_loss(lg, labels) + loc(lr) + iou(lr)

    for name, fn in (("enc_pure", pure), ("enc_ctc", ctc_enc),
                     ("enc_loc", loc_enc), ("enc_all", all_enc)):
        t0 = time.time()
        g = jax.jit(jax.value_and_grad(fn)).lower(params).compile()
        cs = time.time() - t0
        v, _ = g(params)
        jax.block_until_ready(v)
        t0 = time.perf_counter()
        for _ in range(iters):
            v, _ = g(params)
        float(v)
        print(f"{name:8s} grad: {(time.perf_counter() - t0) / iters * 1e3:9.2f} ms"
              f"   (compile {cs:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
