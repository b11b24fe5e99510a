#!/usr/bin/env python
"""Mine background patches from DF2K-style HR images.

Equivalent of reference ``Train/scripts/crop_DF2K.py:31-104``: crop
400x400 patches at multiple scales, preferring crops with high Sobel
gradient variance (texture-rich backgrounds degrade more realistically).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np


def sobel_score(gray: np.ndarray) -> float:
    gx = cv2.Sobel(gray, cv2.CV_32F, 1, 0)
    gy = cv2.Sobel(gray, cv2.CV_32F, 0, 1)
    return float(np.var(np.hypot(gx, gy)))


def mine_patches(img: np.ndarray, patch: int, per_scale: int,
                 rng: np.random.Generator):
    out = []
    for scale in (1.0, 0.75, 0.5):
        im = cv2.resize(img, (0, 0), fx=scale, fy=scale,
                        interpolation=cv2.INTER_AREA)
        h, w = im.shape[:2]
        if h < patch or w < patch:
            continue
        cands = []
        for _ in range(per_scale * 4):
            y = int(rng.integers(0, h - patch + 1))
            x = int(rng.integers(0, w - patch + 1))
            crop = im[y:y + patch, x:x + patch]
            gray = cv2.cvtColor(crop, cv2.COLOR_BGR2GRAY)
            cands.append((sobel_score(gray), crop))
        cands.sort(key=lambda t: -t[0])
        out.extend(c for _, c in cands[:per_scale])
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-i", "--input_dir", required=True)
    parser.add_argument("-o", "--output_dir", required=True)
    parser.add_argument("--patch", type=int, default=400)
    parser.add_argument("--per_scale", type=int, default=2)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    os.makedirs(args.output_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    count = 0
    for name in sorted(os.listdir(args.input_dir)):
        img = cv2.imread(os.path.join(args.input_dir, name))
        if img is None:
            continue
        for patch in mine_patches(img, args.patch, args.per_scale, rng):
            cv2.imwrite(os.path.join(args.output_dir,
                                     f"patch_{count:06d}.png"), patch)
            count += 1
    print(f"wrote {count} patches to {args.output_dir}")


if __name__ == "__main__":
    main()
