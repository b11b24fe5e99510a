#!/usr/bin/env python
"""XLA cost analysis of the LIVE bench program (round 5).

``bench.py`` keeps only ``out.sr`` live, so XLA dead-code-eliminates
the prior generator's 128-res StyledConv pair + ToRGB chain. The FLOP
audit in BENCH_NOTES.md (1297.7 GFLOP/crop -> 151.8 crops/s ceiling)
counts the FULL pipeline; the physical ceiling of the *measured*
program is set by its live FLOPs. This tool compiles exactly the
bench step (same shapes, same env-resolved formulation defaults) and
prints XLA's own accounting: live FLOP, bytes accessed, and the
derived MXU / HBM roofline ceilings in crops/s.

Compile is shared with bench.py through the persistent cache, so a
run after bench.py is cheap.

Env: BENCH_BATCH / BENCH_SLOTS as in bench.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_TFLOPS = 197.0   # v5e bf16 MXU peak
PEAK_HBM_GBS = 819.0  # v5e HBM bandwidth


def main():
    import jax
    import jax.numpy as jnp

    from marconet_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    from marconet_tpu.alphabet import BLANK_INDEX
    from marconet_tpu.models.pipeline import MARCONet

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    slots = int(os.environ.get("BENCH_SLOTS", "8"))

    net = MARCONet(dtype=jnp.bfloat16)

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
        labels[i, :slots] = rng.integers(0, 6735, slots)
        for c in range(slots):
            locs[i, 2 * c] = 0.06 + 0.11 * c
            locs[i, 2 * c + 1] = 0.03
        mask[i, :slots] = 1.0
    labels, locs, mask = map(jnp.asarray, (labels, locs, mask))

    @jax.jit
    def step(p, x):
        out = net.restore(p, x, labels, locs, mask).sr
        return x + (out.mean() * 0).astype(x.dtype), out

    compiled = step.lower(params, lq).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per device
        ca = ca[0]
    fl = float(ca.get("flops", float("nan")))
    by = float(ca.get("bytes accessed", float("nan")))
    mxu_ms = fl / (PEAK_TFLOPS * 1e9)
    hbm_ms = by / (PEAK_HBM_GBS * 1e6)
    print(f"live program, batch {batch} x {slots} slots:")
    print(f"  flops          : {fl / 1e12:.3f} TFLOP/batch "
          f"({fl / 1e9 / batch:.1f} GFLOP/crop)")
    print(f"  bytes accessed : {by / 1e9:.2f} GB/batch")
    print(f"  MXU floor      : {mxu_ms:.1f} ms -> "
          f"{batch / mxu_ms * 1e3:.1f} crops/s at 100% MXU")
    print(f"  HBM floor      : {hbm_ms:.1f} ms -> "
          f"{batch / hbm_ms * 1e3:.1f} crops/s at full bandwidth")
    print(f"  at the measured ~75% XLA conv ceiling: "
          f"{batch / (mxu_ms / 0.75) * 1e3:.1f} crops/s")


if __name__ == "__main__":
    main()
