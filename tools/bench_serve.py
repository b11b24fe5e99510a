#!/usr/bin/env python
"""Serve-path throughput: a synthetic multi-line page through
``TextPageRestorer.restore_page`` on the TPU.

SURVEY/BASELINE configs 4-5 (page batching / long-line splitting) had
parity tests but no chip number. This measures both serve modes:

  * manual  — texts + char_boxes known (the reference's '-m' mode,
    ``test_sr.py:61-75``): pure bucketed SR batching;
  * frontend — per-segment YOLO detection + batched ConvNeXt
    recognition feeding the same SR path (reference step 1,
    ``utils/yolo_ocr_xloc.py``). Random weights (zero-egress host) —
    detections are garbage but the compute is the deployed program.

Page: 8 line boxes, each 64 x 1600 px (h=32-normalized width 800 ->
auto-split into 2 segments each; 16 segments/page). Env:
BENCH_SERVE_ITERS (default 5), BENCH_SERVE_LINES (default 8),
BENCH_SERVE_BUCKETS (comma list, default the serve module's
DEFAULT_BUCKETS — set "16" with BENCH_SERVE_LINES=16+ to measure the
multi-chunk double-buffered path on the cached batch-16 program).
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

    from marconet_tpu.models.pipeline import MARCONet
    from marconet_tpu.serve import TextPageRestorer

    iters = int(os.environ.get("BENCH_SERVE_ITERS", "5"))
    n_lines = int(os.environ.get("BENCH_SERVE_LINES", "8"))
    rng = np.random.default_rng(0)

    net = MARCONet(dtype=jnp.bfloat16)

    @jax.jit
    def init_params(key):
        p = net.init(key)
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, p)

    params = init_params(jax.random.PRNGKey(0))

    page = rng.integers(0, 255, (128 * n_lines, 1700, 3)).astype(np.uint8)
    line_boxes = [[50, 10 + 128 * i, 1650, 74 + 128 * i]
                  for i in range(n_lines)]
    # 10 characters per line, evenly spaced over the 1600-px crop
    texts = ["电话号码一二三四五" + "六" for _ in range(n_lines)]
    char_boxes = [[(40 + 155 * c, 5, 100 + 155 * c, 60)
                   for c in range(10)] for _ in range(n_lines)]

    def run_manual(restorer):
        return restorer.restore_page(page, line_boxes, texts=texts,
                                     char_boxes=char_boxes)

    def bench(label, restorer, fn):
        res = fn(restorer)   # compile all bucket programs
        n_seg = sum(len(r.text) >= 0 for r in res)  # lines out
        t0 = time.perf_counter()
        for _ in range(iters):
            res = fn(restorer)
        dt = (time.perf_counter() - t0) / iters
        segs = sum(int(np.ceil(1600 * 32 / 64 / 512)) for _ in line_boxes)
        print(f"{label:9s} page: {dt * 1e3:8.1f} ms  "
              f"{len(res) / dt:6.1f} lines/s  {segs / dt:6.1f} segments/s",
              flush=True)
        assert n_seg == len(line_boxes)

    buckets = tuple(
        int(v) for v in os.environ.get("BENCH_SERVE_BUCKETS", "").split(",")
        if v) or None
    kw = {"buckets": buckets} if buckets else {}

    bench("manual", TextPageRestorer(net, params, **kw), run_manual)

    # frontend mode: random-weight YOLO + ModelScope-geometry recognizer
    from marconet_tpu.models.convnext_ocr import ConvNextViT, OCRConfig
    from marconet_tpu.models.frontend import CharacterFrontend
    from marconet_tpu.models.yolo import YOLO11

    yolo_vars = jax.jit(YOLO11(nc=1).init)(jax.random.PRNGKey(2),
                                           jnp.zeros((1, 64, 640, 3)))
    cfg = OCRConfig(seq_len=76)
    ocr_vars = jax.jit(ConvNextViT(config=cfg).init)(
        jax.random.PRNGKey(3), jnp.zeros((1, 32, cfg.canonical_width, 3)))
    fe = CharacterFrontend(yolo_vars, ocr_vars, ocr_config=cfg)

    def run_frontend(restorer):
        return restorer.restore_page(page, line_boxes)

    bench("frontend", TextPageRestorer(net, params, frontend=fe, **kw),
          run_frontend)


if __name__ == "__main__":
    main()
