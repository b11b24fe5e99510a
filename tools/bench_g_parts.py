#!/usr/bin/env python
"""G-phase gradient attribution on the TPU.

Round-3 diagnosed the train step's G phase as movement-bound in the SFT
gather/scatter transposes; round-4 replaced those transposes with
one-hot MXU matmuls (``ops/window.py``). This bench isolates where the
remaining G-phase time lives: ``value_and_grad`` of each loss family is
compiled standalone with XLA cost floors, so "SFT backward slow" vs
"conv ceiling" vs "aux losses" is a measurement, not a guess.

Parts (each includes the forwards it needs — parts overlap by design,
they attribute, they don't sum):
  * enc    — CTC + localization over the encoder only;
  * prior  — prior pixel/IoU losses through encoder+prior;
  * srnet  — SR L1 through the SR net only (priors/locs constant):
             the pure SFT forward+backward the round-3 finding indicted;
  * gan    — the three frozen-D hinge terms through the full G;
  * lpips  — the VGG perceptual term through the SR net.

Env: BENCH_TRAIN_BATCH (default 8), BENCH_TRAIN_ITERS (default 10).
Reference step: ``Train/tspgan/models/tspgan_model.py:317-607``.
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
    from marconet_tpu.data.batch_prep import prepare_train_batch
    from marconet_tpu.train import losses as L
    from marconet_tpu.train.train_step import (MARCONetTrainer, TrainBatch,
                                               TrainConfig)

    b = int(os.environ.get("BENCH_TRAIN_BATCH", "8"))
    iters = int(os.environ.get("BENCH_TRAIN_ITERS", "10"))

    trainer = MARCONetTrainer(TrainConfig(), dtype=jnp.bfloat16)

    def make_state(key):
        st = trainer.init_state(key)
        return st, trainer.lpips_variables

    state, trainer.lpips_variables = jax.jit(make_state)(
        jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    gt = rng.uniform(-1, 1, (b, 128, 2048, 3)).astype(np.float32)
    ink = (rng.uniform(0, 1, (b, 128, 2048, 3)) > 0.7).astype(np.float32)
    lq = rng.uniform(-1, 1, (b, 32, 512, 3)).astype(np.float32)
    labels = np.full((b, 16), BLANK_INDEX, np.int64)
    box = np.zeros((b, 32), np.float32)
    for i in range(b):
        n = 8
        labels[i, :n] = rng.integers(0, 6735, n)
        lefts = 0.05 + 0.115 * np.arange(n)
        for c in range(n):
            box[i, 2 * c] = lefts[c]
            box[i, 2 * c + 1] = lefts[c] + 0.05
    raw = prepare_train_batch(gt, ink, labels, box, lq)
    batch = TrainBatch(**{k: jnp.asarray(v) for k, v in raw.items()})

    cfg = trainer.cfg
    n = trainer.max_chars

    # ---- forwards shared by the parts (concrete, grad-free) --------------
    @jax.jit
    def fwd_consts(state, batch):
        logits, locs_lr, w = trainer.encoder.apply(
            {"params": state.encoder["params"]}, batch.lq)
        pred_cw = L.lr_to_center_width(locs_lr)
        safe_labels = jnp.where(batch.char_valid > 0, batch.labels,
                                BLANK_INDEX).reshape(-1)
        pri = trainer.prior.apply({"params": state.prior["params"]},
                                  jnp.repeat(w, n, axis=0), safe_labels)
        bb = batch.lq.shape[0]
        return (pred_cw,
                pri.feat64.reshape(bb, n, *pri.feat64.shape[1:]),
                pri.feat32.reshape(bb, n, *pri.feat32.shape[1:]))

    only_env = os.environ.get("BENCH_G_PARTS")
    need_consts = (not only_env) or \
        any(p in only_env.split(",") for p in ("srnet", "lpips"))
    if need_consts:
        pred_cw_c, feat64_c, feat32_c = jax.block_until_ready(
            fwd_consts(state, batch))
    else:
        pred_cw_c = feat64_c = feat32_c = None

    # ---- part losses ------------------------------------------------------
    def enc_loss(enc_p, batch):
        logits, locs_lr, _ = trainer.encoder.apply({"params": enc_p},
                                                   batch.lq)
        pred_cw = L.lr_to_center_width(locs_lr)
        gt_cw = L.lr_to_center_width(batch.boxinfo_lr)
        return (L.ctc_loss(logits, batch.labels) * cfg.ctc_lambda
                + L.smooth_l1_loss(pred_cw[:, 0::2] * 2048.0,
                                   gt_cw[:, 0::2] * 2048.0)
                * cfg.loc_lambda * 2.0
                + L.smooth_l1_loss(locs_lr * 2048.0,
                                   batch.boxinfo_lr * 2048.0)
                * cfg.loc_lambda
                + L.box_iou_loss(pred_cw, gt_cw, batch.box_valid)
                * cfg.iou_lambda)

    def prior_loss(ep_p, batch):
        from marconet_tpu.train.train_step import _resize_chars
        enc_p, pri_p = ep_p
        bb = batch.lq.shape[0]
        _, _, w = trainer.encoder.apply({"params": enc_p}, batch.lq)
        safe_labels = jnp.where(batch.char_valid > 0, batch.labels,
                                BLANK_INDEX).reshape(-1)
        pri = trainer.prior.apply({"params": pri_p},
                                  jnp.repeat(w, n, axis=0), safe_labels)
        prior128 = pri.image.reshape(bb, n, 128, 128, 3)
        rgb64 = pri.rgb64.reshape(bb, n, 64, 64, 3)
        rgb32 = pri.rgb32.reshape(bb, n, 32, 32, 3)
        cmask = batch.char_valid[:, :, None, None, None]
        return (L.l1_loss(prior128, batch.gt_chars, mask=cmask,
                          weight=cfg.pixel_weight * cfg.lambda128)
                + L.soft_iou_loss(prior128, batch.gt_chars, mask=cmask)
                * cfg.lambda_pix_iou
                + L.l1_loss(rgb64, _resize_chars(batch.gt_chars, 64),
                            mask=cmask,
                            weight=cfg.pixel_weight * cfg.lambda64)
                + L.l1_loss(rgb32, _resize_chars(batch.gt_chars, 32),
                            mask=cmask,
                            weight=cfg.pixel_weight * cfg.lambda32))

    def srnet_loss(srn_p, consts, state, batch):
        # priors/locs concrete (passed as ARGUMENTS, not closure
        # constants — closed-over arrays are baked into the HLO proto
        # and the 547 MB feat64 literal exceeds the remote-compile
        # request limit): grads flow only through the SR net — the
        # isolated SFT forward+backward
        pred_cw_c, feat64_c, feat32_c = consts
        sr, _ = trainer.srnet.apply(
            {"params": srn_p, "spectral": state.srnet["spectral"]},
            batch.lq, feat64_c, feat32_c, pred_cw_c,
            batch.char_valid, mutable=["spectral"])
        return L.l1_loss(sr, batch.gt, weight=cfg.srpixel_weight)

    def gan_loss(g_params, state, batch):
        from marconet_tpu.train.train_step import crop_chars
        enc_p, pri_p, srn_p = g_params
        bb = batch.lq.shape[0]
        _, locs_lr, w = trainer.encoder.apply({"params": enc_p}, batch.lq)
        pred_cw = L.lr_to_center_width(locs_lr)
        safe_labels = jnp.where(batch.char_valid > 0, batch.labels,
                                BLANK_INDEX).reshape(-1)
        pri = trainer.prior.apply({"params": pri_p},
                                  jnp.repeat(w, n, axis=0), safe_labels)
        prior128 = pri.image.reshape(bb, n, 128, 128, 3)
        feat64 = pri.feat64.reshape(bb, n, *pri.feat64.shape[1:])
        feat32 = pri.feat32.reshape(bb, n, *pri.feat32.shape[1:])
        sr, _ = trainer.srnet.apply(
            {"params": srn_p, "spectral": state.srnet["spectral"]},
            batch.lq, jax.lax.stop_gradient(feat64),
            jax.lax.stop_gradient(feat32),
            jax.lax.stop_gradient(pred_cw),
            batch.char_valid, mutable=["spectral"])
        sr_chars = crop_chars(sr, batch.crop_idx, batch.crop_w0)
        d_vars = {"params": state.net_d["params"],
                  "spectral": state.net_d["spectral"]}
        srd_vars = {"params": state.net_srd["params"],
                    "spectral": state.net_srd["spectral"]}
        dnet = trainer._make_disc(update_stats=False)
        mk = batch.char_valid[:, :, None]
        return (L.hinge_g_loss(dnet.apply(
                    d_vars, prior128.reshape(bb * n, 128, 128, 3))
                    .reshape(bb, n, -1), mask=mk) * cfg.gan_lambda
                + L.hinge_g_loss(dnet.apply(
                    srd_vars, jnp.concatenate(
                        [sr_chars, jax.lax.stop_gradient(prior128)], -1)
                    .reshape(bb * n, 128, 128, 6))
                    .reshape(bb, n, -1), mask=mk) * cfg.srgan_lambda
                + L.hinge_g_loss(dnet.apply(
                    d_vars, sr_chars.reshape(bb * n, 128, 128, 3))
                    .reshape(bb, n, -1), mask=mk) * cfg.gan_lambda)

    def lpips_loss(srn_p, consts, state, batch):
        pred_cw_c, feat64_c, feat32_c = consts
        bb = batch.lq.shape[0]
        sr, _ = trainer.srnet.apply(
            {"params": srn_p, "spectral": state.srnet["spectral"]},
            batch.lq, feat64_c, feat32_c, pred_cw_c,
            batch.char_valid, mutable=["spectral"])
        sr_p = sr.reshape(bb, 128, n, 128, 3).transpose(0, 2, 1, 3, 4)
        gt_p = batch.gt.reshape(bb, 128, n, 128, 3).transpose(0, 2, 1, 3, 4)
        lp = trainer.lpips.apply(trainer.lpips_variables,
                                 sr_p.reshape(bb * n, 128, 128, 3),
                                 gt_p.reshape(bb * n, 128, 128, 3))
        return L.masked_mean(lp.reshape(bb, n),
                             batch.patch_valid) * cfg.lpips_lambda

    # 'enc' is OFF by default: inside this process it reproducibly
    # executes at 7-92 s against a 15 ms floor (AOT or plain jit, cache
    # on or off, prior consts present or not), while the IDENTICAL
    # computation — same trainer, same jitted-init state, same
    # prepare_train_batch data — in a standalone script runs at
    # 19-23 ms (tools/probe_ctc.py stage 2, plus the round-5 bisect
    # scripts in BENCH_NOTES). The four rows below are stable across
    # all those variants. Request it explicitly via BENCH_G_PARTS=enc
    # to study the runtime pathology.
    parts = [
        ("enc", enc_loss, state.encoder["params"]),
        ("prior", prior_loss, (state.encoder["params"],
                               state.prior["params"])),
        ("srnet", srnet_loss, None),
        ("gan", gan_loss, None),
        ("lpips", lpips_loss, None),
    ]
    if not os.environ.get("BENCH_G_PARTS"):
        parts = [p for p in parts if p[0] != "enc"]

    g_params = (state.encoder["params"], state.prior["params"],
                state.srnet["params"])
    consts = (pred_cw_c, feat64_c, feat32_c)
    only = os.environ.get("BENCH_G_PARTS")  # comma list, e.g. "srnet,gan"
    for name, fn, wrt in parts:
        if only and name not in only.split(","):
            continue
        if name in ("srnet", "lpips"):
            def run(p, consts, state, batch, fn=fn):
                return jax.value_and_grad(fn)(p, consts, state, batch)
            args = (state.srnet["params"], consts, state, batch)
        elif name == "gan":
            def run(p, state, batch, fn=fn):
                return jax.value_and_grad(fn)(p, state, batch)
            args = (g_params, state, batch)
        else:
            def run(p, batch, fn=fn):
                return jax.value_and_grad(fn)(p, batch)
            args = (wrt, batch)
        t0 = time.time()
        # AOT compile ONLY for XLA's cost analysis. The timed calls go
        # through plain jit dispatch: an AOT executable KEEPS unused
        # arguments in its signature, and the axon remote backend pays a
        # catastrophic per-call cost for unused HOST-UPLOADED argument
        # buffers — measured 152 s/call for the enc part vs 23 ms with
        # pruned args or plain jit, same graph (BENCH_NOTES.md round-5
        # quirks). jit dispatch prunes unused args and matches the AOT
        # executable's compute exactly.
        compiled = jax.jit(run).lower(*args).compile()
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            fl = float(ca.get("flops", 0.0))
            by = float(ca.get("bytes accessed", 0.0))
            floors = (f"floors: MXU {fl / 197e12 * 1e3:7.1f} ms "
                      f"HBM {by / 819e9 * 1e3:7.1f} ms")
        except Exception:
            floors = "floors: n/a"
        timed = jax.jit(run)
        out = timed(*args)
        jax.block_until_ready(out)
        compile_s = time.time() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            loss, _ = timed(*args)
        float(loss)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:6s} grad: {dt:8.1f} ms   {floors}   "
              f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
