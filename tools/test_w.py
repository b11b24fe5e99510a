#!/usr/bin/env python
"""Font-style interpolation CLI.

TPU-native equivalent of reference ``test_w.py:119-132``: extract style
vectors from two LQ images, interpolate in 11 steps, render the first
image's (CTC-collapsed) characters with each blended style, save PNGs and
an animated GIF. The 11 renders run as ONE vmapped XLA program instead of
a python loop.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_lq(path):
    import cv2
    from marconet_tpu.utils.image import preprocess_line

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    pre = preprocess_line(img)
    if pre is None:
        sys.exit(f"{path}: width exceeds 512 after resize to h=32")
    return pre[0]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-w1", "--w1_path", type=str,
                        default="./Testsets/TestW/w1.png")
    parser.add_argument("-w2", "--w2_path", type=str,
                        default="./Testsets/TestW/w2.png")
    parser.add_argument("-o", "--save_path", type=str,
                        default="./Testsets/TestW")
    parser.add_argument("--ckpt_dir", type=str, default="./checkpoints")
    args = parser.parse_args()
    os.makedirs(args.save_path, exist_ok=True)

    import cv2
    import imageio
    import jax.numpy as jnp
    from marconet_tpu.alphabet import collapse_ctc_labels
    from marconet_tpu.models.pipeline import MARCONet
    from test_sr import build_params

    net = MARCONet()
    params = build_params(net, args.ckpt_dir)

    lq1, lq2 = load_lq(args.w1_path), load_lq(args.w2_path)
    logits1, _, w1 = net.encode(params, jnp.asarray(lq1))
    _, _, w2 = net.encode(params, jnp.asarray(lq2))

    labels = collapse_ctc_labels(np.asarray(logits1[0]))
    if not labels:
        sys.exit("no characters recognized in w1 image")
    print(f"Interpolating over {len(labels)} characters")

    weights = jnp.linspace(0.0, 1.0, 11)
    imgs = net.interpolate_styles(params, w1[0], w2[0],
                                  jnp.asarray(labels, jnp.int32), weights)
    imgs = np.asarray(imgs, np.float32)  # (11, n, 128, 128, 3)

    frames = []
    for i in range(imgs.shape[0]):
        row = np.concatenate(list(imgs[i]), axis=1)
        row = np.clip(row * 0.5 + 0.5, 0, 1)
        frames.append((row * 255).astype(np.uint8))
        scale = i / 10
        print(f"Interpolating w1 and w2 with weight {scale:.2f}")
        cv2.imwrite(os.path.join(args.save_path, f"w_{scale:.2f}.png"),
                    cv2.cvtColor(frames[-1], cv2.COLOR_RGB2BGR))
    imageio.mimsave(os.path.join(args.save_path, "w.gif"), frames, "GIF",
                    duration=0.1)
    print("Finishing interpolation.")


if __name__ == "__main__":
    main()
