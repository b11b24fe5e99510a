#!/usr/bin/env python
"""Fetch the released MARCONet checkpoints (reference
``checkpoints/download_github.py:1-11`` / ``Train/scripts/download.py``).

Downloads into ``checkpoints/`` (inference) and optionally the training
warm-start files and fonts with ``--train``. Zero-egress environments can
instead place the ``.pth`` files manually; the converter
(``marconet_tpu.convert``) handles the torch -> JAX mapping at load time.
"""

import argparse
import os
import urllib.request

RELEASE = "https://github.com/csxmli2016/MARCONet/releases/download/v1"

INFERENCE_FILES = [
    "net_prior_generation.pth",
    "net_sr.pth",
    "net_transformer_encoder.pth",
    "yolo11m_character.pt",
]
TRAIN_FILES = [
    "net_d.pth",
    "net_srd.pth",
    "FontsType-V1.zip",
]


def fetch(name: str, out_dir: str):
    os.makedirs(out_dir, exist_ok=True)
    dst = os.path.join(out_dir, name)
    if os.path.exists(dst):
        print(f"{dst} exists, skipping")
        return
    url = f"{RELEASE}/{name}"
    print(f"downloading {url} -> {dst}")
    urllib.request.urlretrieve(url, dst)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out_dir", default="./checkpoints")
    parser.add_argument("--train", action="store_true",
                        help="also fetch training warm-start files + fonts")
    args = parser.parse_args()
    for name in INFERENCE_FILES:
        fetch(name, args.out_dir)
    if args.train:
        for name in TRAIN_FILES:
            fetch(name, args.out_dir)


if __name__ == "__main__":
    main()
