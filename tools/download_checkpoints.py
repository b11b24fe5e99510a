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

# LPIPS perceptual-loss weights (reference uses the pretrained lpips VGG,
# Train/tspgan/losses/text_loss.py:77-105): torchvision VGG16 trunk + the
# lpips package's v0.1 linear heads. Saved under the names
# marconet_tpu.train.lpips.load_lpips_variables searches for.
LPIPS_FILES = [
    ("https://download.pytorch.org/models/vgg16-397923af.pth",
     "vgg16-397923af.pth"),
    ("https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/"
     "master/lpips/weights/v0.1/vgg.pth", "lpips_vgg.pth"),
]


def fetch(name: str, out_dir: str, url: str = None):
    os.makedirs(out_dir, exist_ok=True)
    dst = os.path.join(out_dir, name)
    if os.path.exists(dst):
        print(f"{dst} exists, skipping")
        return
    url = url or f"{RELEASE}/{name}"
    print(f"downloading {url} -> {dst}")
    urllib.request.urlretrieve(url, dst)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out_dir", default="./checkpoints")
    parser.add_argument("--train", action="store_true",
                        help="also fetch training warm-start files + fonts "
                             "+ LPIPS weights")
    args = parser.parse_args()
    for name in INFERENCE_FILES:
        fetch(name, args.out_dir)
    if args.train:
        for name in TRAIN_FILES:
            fetch(name, args.out_dir)
        for url, name in LPIPS_FILES:
            fetch(name, args.out_dir, url=url)


if __name__ == "__main__":
    main()
