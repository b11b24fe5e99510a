#!/usr/bin/env python
"""Dump synthetic training samples for visual inspection.

Equivalent of reference ``Train/syndata_demo.py:459-514`` /
``Train/README.md:58-68``: writes lq / gt / mask / locs-overlay PNG
quadruples to an output directory.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-o", "--out_dir", default="./syn_data_samples")
    parser.add_argument("-n", "--num", type=int, default=4)
    parser.add_argument("--font_dir", default="./TrainData/FontsType-V1")
    parser.add_argument("--bg_dir", default="./TrainData/BGSample")
    parser.add_argument("--corpus", default="")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    from marconet_tpu.data.synth import SynthConfig, TextLineSynthesizer

    cfg = SynthConfig(font_dir=args.font_dir, bg_dir=args.bg_dir,
                      corpus_paths=(args.corpus,) if args.corpus else ())
    synth = TextLineSynthesizer(cfg)
    rng = np.random.default_rng(args.seed)

    for i in range(args.num):
        s = synth.sample(rng)

        def save(name, img01):
            bgr = cv2.cvtColor((np.clip(img01, 0, 1) * 255)
                               .astype(np.uint8), cv2.COLOR_RGB2BGR)
            cv2.imwrite(os.path.join(args.out_dir, f"{i:03d}_{name}.png"),
                        bgr)

        save("gt", s["gt"] * 0.5 + 0.5)
        save("mask", s["mask"])
        save("lq", s["lq"] * 0.5 + 0.5)

        locs_img = (s["gt"] * 0.5 + 0.5).copy()
        n = len(s["text"])
        for c in range(n):
            l_px = int(s["boxinfo"][2 * c] * 2048)
            r_px = int(s["boxinfo"][2 * c + 1] * 2048)
            locs_img[:, max(l_px - 1, 0):l_px + 1] = [1, 0, 0]
            locs_img[:, max(r_px - 1, 0):r_px + 1] = [0, 0, 1]
        save("locs", locs_img)
        print(f"sample {i}: text={s['text']!r}")
    print(f"wrote {args.num} samples to {args.out_dir}")


if __name__ == "__main__":
    main()
