#!/usr/bin/env python
"""Export a plain state dict from an ultralytics YOLO bundle.

The released ``yolo11m_character.pt`` is a pickled ultralytics object;
unpickling it requires the ``ultralytics`` package. Run this once in an
environment that has it; the resulting ``*_sd.pth`` loads anywhere via
``marconet_tpu.convert.yolo_import``.
"""

import argparse
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-i", "--input", default="checkpoints/yolo11m_character.pt")
    parser.add_argument("-o", "--output",
                        default="checkpoints/yolo11m_character_sd.pth")
    args = parser.parse_args()

    import torch

    try:
        from ultralytics import YOLO

        model = YOLO(args.input).model
        sd = model.state_dict()
    except ImportError:
        ckpt = torch.load(args.input, map_location="cpu",
                          weights_only=False)
        model = ckpt["model"] if isinstance(ckpt, dict) else ckpt
        sd = model.float().state_dict()
    torch.save({k: v.float() for k, v in sd.items()}, args.output)
    print(f"wrote {len(sd)} tensors to {args.output}")


if __name__ == "__main__":
    main()
