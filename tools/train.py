#!/usr/bin/env python
"""Training CLI.

Equivalent of the reference launcher (``Train/tspgan/train.py`` +
``Train/options/train.yml``): single entry point, YAML-configured. Where
the reference launches one process per GPU with torch.distributed/NCCL
(``Train/README.md:50``), here a single process drives the whole TPU
slice through the jit-compiled data-parallel step (SPMD over the device
mesh); multi-host execution uses the same code under ``jax.distributed``.

Usage:
    python tools/train.py -opt options/train.yml [--max_steps N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", "--options", type=str,
                        default="options/train.yml")
    parser.add_argument("--max_steps", type=int, default=None,
                        help="stop early (smoke tests)")
    parser.add_argument("--allow_random_lpips", action="store_true",
                        help="permit training without pretrained LPIPS "
                             "VGG weights (different objective!)")
    args = parser.parse_args()

    from marconet_tpu.train.config import load_config
    from marconet_tpu.train.loop import train

    config = load_config(args.options)
    if args.allow_random_lpips:
        config.loop.allow_random_lpips = True
    train(config, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
