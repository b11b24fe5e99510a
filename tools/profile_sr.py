#!/usr/bin/env python
"""Capture a jax.profiler trace of the restore pipeline.

Writes a TensorBoard-loadable trace (``tensorboard --logdir <out>``) for
kernel-level analysis — the tracing/observability layer the reference
lacks (SURVEY.md §5.1). Training traces: set ``MARCONET_PROFILE=<dir>``
for ``tools/train.py``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-o", "--out_dir", default="/tmp/marconet_trace")
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--slots", type=int, default=8)
    parser.add_argument("--iters", type=int, default=3)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from marconet_tpu.alphabet import BLANK_INDEX
    from marconet_tpu.models.pipeline import MARCONet
    from marconet_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    net = MARCONet(dtype=jnp.bfloat16)
    params = net.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    b, s = args.batch, args.slots
    lq = jnp.asarray(rng.uniform(-1, 1, (b, 32, 512, 3))
                     .astype(np.float32), jnp.bfloat16)
    labels = jnp.asarray(rng.integers(0, 6735, (b, s)).astype(np.int32))
    locs = jnp.asarray(np.tile(
        [[0.06 + 0.11 * c if i == 0 else 0.03
          for c in range(s) for i in range(2)]], (b, 1)).astype(np.float32))
    mask = jnp.ones((b, s), jnp.float32)

    out = net.restore(params, lq, labels, locs, mask)
    float(out.sr.mean())  # compile + sync

    jax.profiler.start_trace(args.out_dir)
    for _ in range(args.iters):
        out = net.restore(params, lq, labels, locs, mask)
    float(out.sr.mean())
    jax.profiler.stop_trace()
    print(f"trace written to {args.out_dir}")


if __name__ == "__main__":
    main()
