#!/usr/bin/env python
"""Service-mode demo: batched page/line restoration via TextPageRestorer.

Drives the production serving path (``marconet_tpu/serve.py`` — segment
splitting, size + character-slot bucketing) over a directory of line
crops, end-to-end on the default device, and reports lines/sec. With
``-m`` the ground-truth text comes from the filename suffix after the
last ``_`` (same convention as ``tools/test_sr.py``); otherwise the
JAX YOLO/OCR front-end is used when its weights are present.

Example:
    python tools/serve_demo.py -i /root/reference/Testsets/LQsWithText \
        -o /tmp/serve_out -m
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-i", "--test_path", required=True)
    parser.add_argument("-o", "--save_path", required=True)
    parser.add_argument("-m", "--manual", action="store_true",
                        help="take GT text from the filename suffix")
    parser.add_argument("--ckpt_dir", type=str, default="./checkpoints")
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--repeat", type=int, default=1,
                        help="duplicate the request list N times "
                             "(throughput demo)")
    args = parser.parse_args()
    os.makedirs(args.save_path, exist_ok=True)

    import cv2
    import jax.numpy as jnp

    from marconet_tpu.models.pipeline import MARCONet
    from marconet_tpu.serve import LineRequest, TextPageRestorer
    from test_sr import build_params

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    net = MARCONet(dtype=dtype)
    params = build_params(net, args.ckpt_dir)

    frontend = None
    if not args.manual:
        try:
            from marconet_tpu.models.frontend import CharacterFrontend
            frontend = CharacterFrontend.from_checkpoints(args.ckpt_dir)
        except Exception as e:  # noqa: BLE001
            print(f"front-end unavailable ({e}); falling back to -m "
                  "filename texts")
            args.manual = True

    requests = []
    names = []
    for fname in sorted(os.listdir(args.test_path)):
        if not fname.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")):
            continue
        img = cv2.cvtColor(
            cv2.imread(os.path.join(args.test_path, fname)),
            cv2.COLOR_BGR2RGB)
        text = None
        if args.manual:
            text = os.path.splitext(fname)[0].split("_")[-1]
        requests.append(LineRequest(image=img, text=text))
        names.append(fname)
    if not requests:
        print(f"no images in {args.test_path}")
        return
    requests = requests * args.repeat
    names = names * args.repeat

    server = TextPageRestorer(net, params, frontend=frontend)
    t0 = time.perf_counter()
    results = server.restore_lines(requests)  # warmup + compile included
    dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    results = server.restore_lines(requests)
    warm = time.perf_counter() - t0

    for i, (name, res) in enumerate(zip(names, results)):
        out = cv2.cvtColor(res.sr.astype(np.uint8), cv2.COLOR_RGB2BGR)
        stem = os.path.splitext(name)[0]
        cv2.imwrite(os.path.join(args.save_path, f"{i:03d}_{stem}.png"),
                    out)
        print(f"{name}: text='{res.text}' sr={res.sr.shape}")
    print(f"{len(requests)} lines: first pass {dt:.2f}s (incl. compile), "
          f"warm {warm:.2f}s = {len(requests) / warm:.1f} lines/s")


if __name__ == "__main__":
    main()
