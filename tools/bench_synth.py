#!/usr/bin/env python
"""Host data-synthesis throughput (the training loop's CPU side).

The reference's dataset is its acknowledged CPU hot path
(``Train/tspgan/data/text_degradation_dataset.py:352-432``, 2 workers
per GPU + prefetch 96): per sample it renders a 2048x128 text line and
runs the full second-order degradation chain. This bench measures the
TPU-native synthesizer (``data/synth.py``) end-to-end — render +
degrade + batch prep — so the loader defaults (``LoopConfig.
num_workers``) and the host-core requirement for a measured train-step
rate are justified by numbers, not guesses.

Modes:
  * in-process, native C++ degrade kernels (default build);
  * in-process, ``MARCONET_NATIVE=0`` numpy/scipy fallback;
  * through ``BatchLoader`` (spawn workers + bounded queue), 1 and 2
    workers — on a multi-core host this shows worker scaling; on a
    1-core host it shows the IPC overhead bound instead.

Env: BENCH_SYNTH_SAMPLES (default 24), BENCH_SYNTH_BATCH (default 8),
BENCH_SYNTH_WORKERS (comma list, default "1,2"), and the usual
FONT_DIR/BG_DIR/CORPUS paths (defaults: the DejaVu fallback font,
procedural backgrounds, random text — the environment has no released
font pack; rates with the real CJK pack will differ mainly through
glyph-extent retry frequency, not the degrade chain, which dominates).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def in_process_rate(n: int, batch: int) -> float:
    from marconet_tpu.data.synth import SynthConfig, TextLineSynthesizer

    synth = TextLineSynthesizer(SynthConfig(
        font_dir=os.environ.get("FONT_DIR", ""),
        bg_dir=os.environ.get("BG_DIR", ""),
        corpus_paths=tuple(p for p in
                           os.environ.get("CORPUS", "").split(",") if p)))
    rng = np.random.default_rng(0)
    synth.batch(batch, rng)  # warm caches (font load, lib build)
    t0 = time.perf_counter()
    done = 0
    while done < n:
        synth.batch(batch, rng)
        done += batch
    return done / (time.perf_counter() - t0)


def loader_rate(n: int, batch: int, workers: int) -> float:
    from marconet_tpu.train.config import LoopConfig
    from marconet_tpu.train.loop import BatchLoader

    cfg = LoopConfig(font_dir=os.environ.get("FONT_DIR", ""),
                     bg_dir=os.environ.get("BG_DIR", ""),
                     num_workers=workers)
    loader = BatchLoader(cfg, batch, num_workers=workers, prefetch=4)
    try:
        it = iter(loader)
        next(it)  # first batch covers worker startup + font warmup
        t0 = time.perf_counter()
        done = 0
        while done < n:
            next(it)
            done += batch
        return done / (time.perf_counter() - t0)
    finally:
        loader.close()


def main():
    n = int(os.environ.get("BENCH_SYNTH_SAMPLES", "24"))
    batch = int(os.environ.get("BENCH_SYNTH_BATCH", "8"))
    worker_counts = [int(w) for w in os.environ.get(
        "BENCH_SYNTH_WORKERS", "1,2").split(",") if w]

    from marconet_tpu.data import native

    results = {}
    native_on = native.available()
    r = in_process_rate(n, batch)
    results["in_process_native" if native_on else "in_process_numpy"] = r
    print(f"in-process ({'native C++' if native_on else 'numpy/scipy'} "
          f"degrade): {r:.2f} samples/s", flush=True)

    if native_on:
        # fresh interpreter state not needed: flip the loader gate and
        # drop the cached handle for the fallback A/B
        os.environ["MARCONET_NATIVE"] = "0"
        native._lib, native._tried = None, True
        r2 = in_process_rate(n, batch)
        results["in_process_numpy"] = r2
        print(f"in-process (numpy/scipy degrade): {r2:.2f} samples/s",
              flush=True)
        del os.environ["MARCONET_NATIVE"]
        native._tried = False

    for w in worker_counts:
        rw = loader_rate(n, batch, w)
        results[f"loader_{w}w"] = rw
        print(f"BatchLoader, {w} worker(s): {rw:.2f} samples/s",
              flush=True)

    ncpu = os.cpu_count() or 1
    best = max(results.values())
    print(f"\nhost: {ncpu} core(s). Feeding a train step at R samples/s "
          f"needs ceil(R / {best:.2f}) worker cores at this rate.",
          flush=True)
    print(json.dumps({"metric": "synth_samples_per_s", "value":
                      round(best, 2), "per_mode": {k: round(v, 2)
                                                   for k, v in
                                                   results.items()},
                      "cores": ncpu}))


if __name__ == "__main__":
    main()
