#!/usr/bin/env python
"""Train-step throughput on the TPU.

First hardware evidence for the training half of the framework
(the reference's dominant compute story is the 8M-iteration GAN run,
``Train/options/train.yml:102``): jits the REAL 3-phase step
(G+enc+SR / D / SRD, five nets, spectral-state round-trip, donation) at
width 1.0 / 16 slots with bf16 compute over f32 params+optimizer (the
bf16-where-safe policy), and prints samples/s/chip plus a per-phase
split (G-phase gradient program, D and SRD discriminator programs timed
standalone at the same shapes).

Env: BENCH_TRAIN_BATCH (default 2 = the reference's batch_size_per_gpu),
BENCH_TRAIN_ITERS (default 10).
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

    b = int(os.environ.get("BENCH_TRAIN_BATCH", "2"))
    iters = int(os.environ.get("BENCH_TRAIN_ITERS", "10"))

    print(f"building trainer (width 1.0, bf16 compute, batch {b}) ...",
          flush=True)
    trainer = MARCONetTrainer(TrainConfig(), dtype=jnp.bfloat16)
    t0 = time.time()
    # jit the whole init: one compiled program instead of hundreds of
    # small remote dispatches (eager init measured 585 s through the
    # tunnel at width 1.0 — same trick as tools/dryrun_worker.py)
    def make_state(key):
        st = trainer.init_state(key)
        return st, trainer.lpips_variables

    state, trainer.lpips_variables = jax.jit(make_state)(
        jax.random.PRNGKey(0))
    print(f"init_state {time.time() - t0:.1f}s", flush=True)

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

    # ---- full step --------------------------------------------------------
    # donate the carried state: without donation two full copies of the
    # 5-net params + optimizer state live across each step (OOM risk on a
    # 16 GB chip at width 1.0)
    def cost(compiled, label):
        # XLA's own accounting for the compiled program: the MXU floor
        # at the v5e bf16 peak and the HBM floor at 819 GB/s — the two
        # physical bounds the measured step time is judged against
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            fl = float(ca.get("flops", 0.0))
            by = float(ca.get("bytes accessed", 0.0))
            print(f"{label} cost: {fl / 1e12:.3f} TFLOP -> "
                  f"{fl / 197e12 * 1e3:.1f} ms MXU floor; "
                  f"{by / 1e9:.2f} GB -> {by / 819e9 * 1e3:.1f} ms "
                  f"HBM floor", flush=True)
        except Exception as e:  # pragma: no cover
            print(f"{label} cost analysis unavailable: {e}", flush=True)

    # AOT compile once and time the SAME executable (compiling through
    # jit again would redo the compile on this compile-dominated host)
    t0 = time.time()
    step = jax.jit(trainer.train_step, donate_argnums=0) \
        .lower(state, batch).compile()
    print(f"full-step compile {time.time() - t0:.1f}s", flush=True)
    cost(step, "step")
    t0 = time.time()
    st, metrics = step(state, batch)
    del state  # buffers donated — invalid from here on
    jax.block_until_ready(metrics)
    print(f"full-step first call {time.time() - t0:.1f}s  "
          f"l_g_total={float(metrics['l_g_total']):.3f}", flush=True)

    t0 = time.perf_counter()
    for _ in range(iters):
        st, metrics = step(st, batch)
    float(metrics["l_g_total"])  # host sync through a data dependency
    dt_step = (time.perf_counter() - t0) / iters
    print(f"train_step: {dt_step * 1e3:8.1f} ms/step   "
          f"{b / dt_step:6.2f} samples/s/chip", flush=True)

    state = st  # post-loop state stands in for the phase breakdowns

    # ---- G phase (the value_and_grad over encoder+prior+srnet) -----------
    def g_phase_fn(g_params, state, batch):
        (_, aux), grads = jax.value_and_grad(
            trainer._g_loss, has_aux=True)(g_params, state, batch)
        return aux["metrics"]["l_g_total"], grads

    g_params = (state.encoder["params"], state.prior["params"],
                state.srnet["params"])
    g_phase = jax.jit(g_phase_fn).lower(g_params, state, batch).compile()
    cost(g_phase, "G phase")
    loss, grads = g_phase(g_params, state, batch)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        loss, grads = g_phase(g_params, state, batch)
    float(loss)
    dt_g = (time.perf_counter() - t0) / iters
    print(f"G phase:    {dt_g * 1e3:8.1f} ms", flush=True)

    # ---- D / SRD phases (two-forward hinge + grad, same shapes) ----------
    n = trainer.max_chars
    cmask3 = jnp.asarray(raw["char_valid"])[:, :, None]
    fake3 = jnp.asarray(rng.uniform(-1, 1, (b, n, 128, 128, 3)),
                        jnp.float32)
    real3 = jnp.asarray(rng.uniform(-1, 1, (b, n, 128, 128, 3)),
                        jnp.float32)

    def disc_loss(d_params, spectral, fake_in, real_in, ch):
        dnet = trainer._make_disc(update_stats=True)
        fk, upd = dnet.apply({"params": d_params, "spectral": spectral},
                             fake_in.reshape(b * n, 128, 128, ch),
                             mutable=["spectral"])
        rl, upd = dnet.apply({"params": d_params,
                              "spectral": upd["spectral"]},
                             real_in.reshape(b * n, 128, 128, ch),
                             mutable=["spectral"])
        return L.hinge_d_loss(rl.reshape(b, n, -1), fk.reshape(b, n, -1),
                              real_mask=cmask3, fake_mask=cmask3)

    for name, netvar, ch, fk, rl in (
            ("D phase", state.net_d, 3, fake3, real3),
            ("SRD phase", state.net_srd, 6,
             jnp.concatenate([fake3, real3], -1),
             jnp.concatenate([real3, fake3], -1))):
        phase = jax.jit(lambda p, s, f, r, ch=ch: jax.value_and_grad(
            disc_loss)(p, s, f, r, ch)) \
            .lower(netvar["params"], netvar["spectral"], fk, rl).compile()
        cost(phase, name)
        val, _ = phase(netvar["params"], netvar["spectral"], fk, rl)
        jax.block_until_ready(val)
        t0 = time.perf_counter()
        for _ in range(iters):
            val, _ = phase(netvar["params"], netvar["spectral"], fk, rl)
        float(val)
        print(f"{name}:  {(time.perf_counter() - t0) / iters * 1e3:8.1f} ms",
              flush=True)

    print(f'{{"metric": "train_samples_per_s_chip", '
          f'"value": {b / dt_step:.2f}, "batch": {b}}}')


if __name__ == "__main__":
    main()
