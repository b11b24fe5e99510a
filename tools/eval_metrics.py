#!/usr/bin/env python
"""PSNR/SSIM evaluation harness.

Computes metrics between two directories of images (e.g. this framework's
SR outputs vs the reference's outputs, or SR vs ground truth). The
reference ships the metric helpers unused (``Train/util/utils_image.py:
622,643``); here they are wired into a proper harness, including the
Y-channel variants customary for SR papers.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-a", "--dir_a", required=True,
                        help="restored/SR image dir")
    parser.add_argument("-b", "--dir_b", required=True,
                        help="reference/GT image dir")
    parser.add_argument("--border", type=int, default=0)
    parser.add_argument("--y_channel", action="store_true")
    args = parser.parse_args()

    from marconet_tpu.data.imutils import rgb2ycbcr
    from marconet_tpu.utils.image import calculate_psnr, calculate_ssim

    names = sorted(set(os.listdir(args.dir_a)) &
                   set(os.listdir(args.dir_b)))
    if not names:
        sys.exit("no common files between the two directories")

    psnrs, ssims = [], []
    for name in names:
        a = cv2.imread(os.path.join(args.dir_a, name))
        b = cv2.imread(os.path.join(args.dir_b, name))
        if a is None or b is None:
            continue
        if a.shape != b.shape:
            b = cv2.resize(b, (a.shape[1], a.shape[0]),
                           interpolation=cv2.INTER_CUBIC)
        if args.y_channel:
            a = rgb2ycbcr(cv2.cvtColor(a, cv2.COLOR_BGR2RGB) / 255.0,
                          only_y=True) * 255.0
            b = rgb2ycbcr(cv2.cvtColor(b, cv2.COLOR_BGR2RGB) / 255.0,
                          only_y=True) * 255.0
        p = calculate_psnr(a, b, border=args.border)
        s = calculate_ssim(a.astype(np.float64), b.astype(np.float64),
                           border=args.border)
        psnrs.append(p)
        ssims.append(s)
        print(f"{name}: PSNR {p:.3f} dB  SSIM {s:.4f}")

    print(f"\nmean over {len(psnrs)} images: "
          f"PSNR {np.mean(psnrs):.3f} dB  SSIM {np.mean(ssims):.4f}")


if __name__ == "__main__":
    main()
