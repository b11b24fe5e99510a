#!/usr/bin/env python
"""Benchmark: x4 SR text-line crops/sec on one chip (full pipeline).

Measures the end-to-end jitted restore program — encoder, 16-slot prior
generation and SFT SR — in bfloat16 at a service batch size, on whatever
single device JAX provides (TPU under the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is against the 500 crops/sec/chip north star
(BASELINE.md; the reference's measurable baseline is a CPU-only
19.5 s/image survey measurement — no GPU figure is published).

Scope disclosure: the measured program keeps only ``out.sr`` live, so
XLA dead-code-eliminates the prior generator's 128-res ToRGB chain
(the glyph images the reference renders for its collage). The metric
is SR crops/s — the RGB branch is a visualization output, measured
separately by ``tools/bench_prior_parts.py``.

Per-window wall times go to stderr (the min is the headline; windows
are independent, so earlier single-window rounds remain comparable).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from marconet_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    from marconet_tpu.alphabet import BLANK_INDEX
    from marconet_tpu.models.pipeline import MARCONet

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    # slot bucketing: the pipeline is shape-polymorphic over character
    # slots and a masked 16-slot run is equivalent to an 8-slot run up to
    # float-level reassociation noise (tests/test_models.py slot-bucketing
    # tests); the canonical workload is 8-char lines.
    slots = int(os.environ.get("BENCH_SLOTS", "8"))

    net = MARCONet(dtype=jnp.bfloat16)

    # jit the whole init + bf16 cast: ONE compiled program instead of
    # hundreds of tiny eager dispatches, each a remote compile through
    # the tunnel on a cache miss (the bench_train/dryrun trick). The
    # cast also means no step-time conversion of 88M f32 params.
    @jax.jit
    def init_params(key):
        p = net.init(key)
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, p)

    params = init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    lq = jnp.asarray(rng.uniform(-1, 1, (batch, 32, 512, 3))
                     .astype(np.float32), jnp.bfloat16)
    labels = np.full((batch, slots), BLANK_INDEX, np.int32)
    locs = np.zeros((batch, 2 * slots), np.float32)
    mask = np.zeros((batch, slots), np.float32)
    for i in range(batch):
        n = slots
        labels[i, :n] = rng.integers(0, 6735, n)
        for c in range(n):
            locs[i, 2 * c] = 0.06 + 0.11 * c
            locs[i, 2 * c + 1] = 0.03
        mask[i, :n] = 1.0
    labels, locs, mask = map(jnp.asarray, (labels, locs, mask))

    # Each call feeds a zero-valued function of the previous output back
    # into the input, so successive steps are data-dependent, and the
    # final host transfer is a hard sync — under remote-execution
    # backends block_until_ready alone does not guarantee completion.
    @jax.jit
    def step(p, x):
        out = net.restore(p, x, labels, locs, mask).sr
        return x + (out.mean() * 0).astype(x.dtype), out

    # BENCH_LOOP=scan runs the measured iterations as ONE on-device
    # lax.scan program (same per-step restore graph, same data-dependent
    # chaining) with a single dispatch + final host sync. A production
    # server keeps the device queue full with async dispatch, so per-step
    # host round-trips are not part of steady-state throughput; under the
    # axon tunnel each per-step dispatch costs ~1-3.5 ms of pure harness
    # overhead (BENCH_NOTES.md quirks), which the host-loop mode charges
    # to the model. Both modes are measured side by side in BENCH_NOTES.
    loop_mode = os.environ.get("BENCH_LOOP", "host")

    if loop_mode == "scan":
        @jax.jit
        def run(p, x0):
            def body(x, _):
                x, out = step(p, x)
                return x, ()
            x, _ = jax.lax.scan(body, x0, None, length=iters)
            return x

        run(params, lq).block_until_ready()  # warmup + compile
        t0 = time.perf_counter()
        x = run(params, lq)
        float(jnp.mean(x))  # host transfer == hard sync
        dt = time.perf_counter() - t0
    else:
        x, out = step(params, lq)  # warmup + compile
        float(out.mean())

        # best-of-windows: the remote tunnel adds minutes-long ~20x
        # degradation episodes and per-dispatch jitter (BENCH_NOTES.md
        # quirks); the minimum over a few independent windows is the
        # standard noise-robust estimator of steady-state time (timeit's
        # min-of-repeats) — it discards interference, never the model
        windows = int(os.environ.get("BENCH_WINDOWS", "3"))
        dt = float("inf")
        for w in range(windows):
            t0 = time.perf_counter()
            x = lq
            for _ in range(iters):
                x, out = step(params, x)
            float(out.mean())  # host transfer == hard sync
            dw = time.perf_counter() - t0
            print(f"window {w}: {dw:.3f}s = "
                  f"{batch * iters / dw:.2f} crops/s", file=sys.stderr,
                  flush=True)
            dt = min(dt, dw)

    crops_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "sr_crops_per_sec_per_chip",
        "value": round(crops_per_sec, 2),
        "unit": "crops/s",
        "vs_baseline": round(crops_per_sec / 500.0, 3),
    }))


if __name__ == "__main__":
    main()
