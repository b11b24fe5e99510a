#!/usr/bin/env python
"""Detection/recognition front-end throughput on the TPU.

The reference's step 1 (``test_sr.py:85-94`` → ``utils/yolo_ocr_xloc.py:
7-103``) runs YOLO once per image and the ConvNeXt recognizer once per
character box. This bench times the TPU-native equivalents standalone:

  * ``yolo+nms``  — the jitted YOLO11-m forward + static NMS at the
    letterboxed 640 geometry (one dispatch per image);
  * ``ocr xN``    — the batched canonical-width recognizer
    (``CharacterFrontend.recognize_segments`` device program) at the
    per-line window counts 8 / 16 / 32;
  * ``frontend/line`` — the full host path per line: letterbox + detect
    + 5-box mask windows + ONE batched recognizer call (the round-5
    batching; the reference dispatches per box).

Weights are random (zero-egress host: no released .pth) — timing only;
parity is covered by the torch-oracle tests. Env: BENCH_FE_ITERS
(default 20).
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

    from marconet_tpu.models.convnext_ocr import ConvNextViT, OCRConfig
    from marconet_tpu.models.frontend import CharacterFrontend
    from marconet_tpu.models.yolo import YOLO11

    iters = int(os.environ.get("BENCH_FE_ITERS", "20"))
    rng = np.random.default_rng(0)

    # ---- YOLO + NMS at the deployed geometry ------------------------------
    yolo = YOLO11(nc=1)
    # auto-letterbox of a 32x512 text line -> 64x640 padded input; a full
    # page crops letterbox to 640x640 — time both
    yolo_vars = jax.jit(yolo.init)(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 64, 640, 3)))

    # ModelScope-geometry recognizer (seq_len 76 -> canonical width 304,
    # the released checkpoint's shape; OCRConfig defaults)
    cfg = OCRConfig(seq_len=76)
    ocr = ConvNextViT(config=cfg)
    ocr_vars = jax.jit(ocr.init)(
        jax.random.PRNGKey(1),
        jnp.zeros((1, 32, cfg.canonical_width, 3)))

    fe = CharacterFrontend(yolo_vars, ocr_vars, ocr_config=cfg)

    def timed(label, fn, *args):
        out = fn(*args)           # compile + warm
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree.leaves(out)[0])  # host sync
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:18s} {dt * 1e3:8.2f} ms", flush=True)
        return dt

    for h, w in ((64, 640), (640, 640)):
        img = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)), jnp.float32)
        timed(f"yolo+nms {h}x{w}", fe._detect, img)

    for nseg in (8, 16, 32):
        x = jnp.asarray(rng.uniform(-1, 1,
                                    (nseg, 32, cfg.canonical_width, 3)),
                        jnp.float32)
        dt = timed(f"ocr x{nseg}", fe._recognize, x)
        print(f"{'':18s} -> {nseg / dt:8.1f} segments/s", flush=True)

    # ---- full host path per line ------------------------------------------
    # synthetic 32x512 line with 8 synthetic 'character' boxes: the host
    # masking/letterbox work is real; detection returns whatever the
    # random-weight YOLO finds, so the per-line number uses forced boxes
    # through mask_segment + recognize_segments (the deployed pipeline
    # minus NMS-found boxes, which the yolo+nms row already covers)
    from marconet_tpu.models.frontend import mask_segment

    line = (rng.uniform(0, 255, (32, 512, 3))).astype(np.uint8)
    boxes = [[4 + 60 * i, 2, 52 + 60 * i, 30] for i in range(8)]

    def full_line():
        segs = [mask_segment(line, boxes, j)[0] for j in range(len(boxes))]
        return fe.recognize_segments(segs)

    full_line()
    t0 = time.perf_counter()
    for _ in range(iters):
        full_line()
    dt = (time.perf_counter() - t0) / iters
    print(f"{'frontend/line(8)':18s} {dt * 1e3:8.2f} ms "
          f"= {1.0 / dt:6.1f} lines/s (host mask + batched OCR)",
          flush=True)


if __name__ == "__main__":
    main()
