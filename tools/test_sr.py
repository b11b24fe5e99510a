#!/usr/bin/env python
"""Blind text-line SR inference CLI.

TPU-native equivalent of reference ``test_sr.py:236-258``: same flags
(``-i/--test_path``, ``-o/--save_path``, ``-m/--manual``) and the same
4-row output collage (LQ / predicted boxes / SR / glyph priors).

In manual mode (``-m``) the ground-truth text is taken from the filename
suffix after the last ``_`` (reference ``test_sr.py:155-162``) and
character boxes come from the encoder's own locs head, so no detection
front-end is needed. Without ``-m``, the JAX YOLO/OCR front-end is used
when its weights are available; otherwise the tool falls back to manual
parsing and warns.

Example:
    python tools/test_sr.py -i Testsets/LQsWithText -o results/ -m \
        --ckpt_dir checkpoints/
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_params(net, ckpt_dir, rng_seed=0):
    """Converted torch checkpoints when available, random init otherwise."""
    import jax
    import jax.numpy as jnp
    from marconet_tpu.convert import load_reference_checkpoints

    needed = ["net_transformer_encoder.pth", "net_prior_generation.pth",
              "net_sr.pth"]
    if ckpt_dir and all(os.path.exists(os.path.join(ckpt_dir, n))
                        for n in needed):
        print(f"Loading converted checkpoints from {ckpt_dir}")
        raw = load_reference_checkpoints(ckpt_dir)
        return jax.tree.map(jnp.asarray, raw)
    print("WARNING: released checkpoints not found — using random weights "
          "(pipeline demo only). Fetch them with "
          "`python tools/download_checkpoints.py`.")
    return net.init(jax.random.PRNGKey(rng_seed))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-i", "--test_path", type=str,
                        default="./Testsets/LQs")
    parser.add_argument("-o", "--save_path", type=str, default=None)
    parser.add_argument("-m", "--manual", action="store_true",
                        help="take GT text from the filename suffix")
    parser.add_argument("--ckpt_dir", type=str, default="./checkpoints")
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"])
    args = parser.parse_args()

    save_path = args.save_path
    if save_path is None:
        stamp = time.strftime("%m-%d_%H-%M", time.localtime())
        save_path = args.test_path.rstrip("/") + f"_{stamp}_MARCONetTPU"
    os.makedirs(save_path, exist_ok=True)

    import cv2
    import jax
    import jax.numpy as jnp
    from marconet_tpu.alphabet import (BLANK_INDEX, labels_from_text,
                                       text_from_labels)
    from marconet_tpu.models.encoder import MAX_CHARS
    from marconet_tpu.models.pipeline import MARCONet
    from marconet_tpu.utils.image import (draw_boxes, postprocess_sr,
                                          preprocess_line, stack_collage)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    net = MARCONet(dtype=dtype)
    params = build_params(net, args.ckpt_dir)

    frontend = None
    if not args.manual:
        try:
            from marconet_tpu.models.frontend import CharacterFrontend
            frontend = CharacterFrontend.from_checkpoints(args.ckpt_dir)
        except Exception as e:  # pragma: no cover
            print(f"WARNING: detection front-end unavailable ({e}); "
                  "falling back to filename labels + encoder locs.")

    img_names = sorted(os.listdir(args.test_path))
    for img_name in img_names:
        img_path = os.path.join(args.test_path, img_name)
        base, _ = os.path.splitext(img_name)
        img = cv2.imread(img_path, cv2.IMREAD_COLOR)
        if img is None:
            continue
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

        pre = preprocess_line(img)
        if pre is None:
            print(f"Warning!!! {img_name}: LQ wider than 512 after resize "
                  "to h=32 — crop it into shorter segments. Skipping.")
            continue
        lq, show_lq, ori_w = pre

        # --- labels + locs -------------------------------------------------
        if frontend is not None:
            det = frontend(img)
            text, locs_vec = det.text, det.locs
            if len(det.boxes) > 0 and not any(det.chars):
                # OCR recognizer weights absent: recognize with the
                # encoder's own CTC head (the reference's test_w.py
                # clear_labels path), keeping YOLO boxes for locs
                from marconet_tpu.alphabet import collapse_ctc_labels
                logits, _, _ = net.encode(params, jnp.asarray(lq))
                collapsed = collapse_ctc_labels(np.asarray(
                    logits[0], np.float32))
                text = text_from_labels(collapsed)
                n_boxes = len(det.boxes)
                if len(text) != n_boxes:
                    print(f"Warning!!! {img_name}: encoder CTC gave "
                          f"{len(text)} chars for {n_boxes} boxes; "
                          "using the shorter count.")
                    text = text[:n_boxes]
                print(f"  encoder-CTC recognition: {text!r}")
        else:
            text = base.split("_")[-1]
            locs_vec = None
        labels_list = [l for l in labels_from_text(text) if l >= 0]
        n_chars = len(labels_list)
        if n_chars < 1:
            print(f"Warning!!! No character for {img_name}. Continue...")
            continue
        if n_chars > MAX_CHARS:
            print(f"Warning!!! {img_name} has {n_chars} chars > "
                  f"{MAX_CHARS}. Truncating.")
            labels_list = labels_list[:MAX_CHARS]
            n_chars = MAX_CHARS

        labels = np.full((1, MAX_CHARS), BLANK_INDEX, np.int32)
        labels[0, :n_chars] = labels_list
        mask = np.zeros((1, MAX_CHARS), np.float32)
        mask[0, :n_chars] = 1.0

        locs = np.zeros((1, 2 * MAX_CHARS), np.float32)
        if locs_vec is not None:
            locs[0, :len(locs_vec)] = locs_vec[:2 * MAX_CHARS]
        # without a front-end, locs are refined below from the encoder's
        # own locs head

        out = net.restore(params, jnp.asarray(lq), jnp.asarray(labels),
                          jnp.asarray(locs), jnp.asarray(mask))
        if locs_vec is None:
            # use the encoder's predicted locs for the first n slots
            pred = np.asarray(out.pred_locs, np.float32)[0]
            locs[0, :2 * n_chars] = pred[:2 * n_chars]
            out = net.restore(params, jnp.asarray(lq), jnp.asarray(labels),
                              jnp.asarray(locs), jnp.asarray(mask))

        print(f"Restoring {img_name}: text={text!r} chars={n_chars}")

        sr = np.asarray(out.sr[0], np.float32)
        show_sr = postprocess_sr(sr, show_lq.shape[1])
        show_locs = draw_boxes(show_lq, locs[0], n_chars)
        priors = np.asarray(out.priors[0], np.float32)
        collage = stack_collage(show_lq, show_locs, show_sr, priors,
                                n_chars)
        out_name = f"{base}_{text}.png"
        cv2.imwrite(os.path.join(save_path, out_name),
                    cv2.cvtColor(collage.astype(np.uint8),
                                 cv2.COLOR_RGB2BGR))
    print(f"Done. Results in {save_path}")


if __name__ == "__main__":
    main()
