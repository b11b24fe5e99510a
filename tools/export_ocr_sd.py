#!/usr/bin/env python
"""Export the ModelScope OCR recognizer to plain files for conversion.

Run on a machine WITH the ``modelscope`` package + network access (this
container is zero-egress); copy the outputs into the checkpoint dir:

    python tools/export_ocr_sd.py --out checkpoints/

Produces:
  * ``ocr_convnext_sd.pth``  — the recognizer's plain state dict
  * ``ocr_vocab.txt``        — the model's label dictionary
  * ``ocr_key_manifest.json``— {key: shape} of every tensor, so the
    zero-egress converter test (tests/test_frontend.py) can be refreshed
    against the real layout if it ever drifts from the recorded spec

The model is the one the reference drives per segment
(``test_sr.py:56``): ``damo/cv_convnextTiny_ocr-recognition-general_damo``.
"""

import argparse
import json
import os
import shutil


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str,
                        default="damo/cv_convnextTiny_ocr-recognition"
                                "-general_damo")
    parser.add_argument("--out", type=str, default="checkpoints")
    args = parser.parse_args()

    import torch
    from modelscope.models import Model

    model = Model.from_pretrained(args.model)
    # the recognizer torch module lives on the wrapper; fall back to the
    # wrapper itself if the attribute layout changes
    net = getattr(model, "recognizer", model)
    sd = {k: v.detach().cpu() for k, v in net.state_dict().items()}

    os.makedirs(args.out, exist_ok=True)
    torch.save(sd, os.path.join(args.out, "ocr_convnext_sd.pth"))
    manifest = {k: list(v.shape) for k, v in sd.items()}

    # true attention head count (NOT recoverable from tensor shapes, and
    # attention output depends on it) + the preprocessing contract, so
    # the zero-egress converter can assert both at load time
    num_heads = None
    for m in net.modules():
        if hasattr(m, "num_heads"):
            num_heads = int(m.num_heads)
            break
    manifest["__meta__"] = {
        "num_heads": num_heads,
        # marconet_tpu's recognize_segment applies exactly this:
        # resize to height 32 (aspect-preserving), normalize
        # (x/255 - 0.5) / 0.5 -> [-1, 1], RGB channel order. If the
        # ModelScope preprocessor for this model differs, record the
        # difference here and adjust CharacterFrontend.recognize_segment.
        "input_range": "[-1,1] via (x/255-0.5)/0.5",
        "input_height": 32,
        "channel_order": "RGB",
    }
    with open(os.path.join(args.out, "ocr_key_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, ensure_ascii=False)

    # vocab: the model dir ships the label dictionary
    model_dir = getattr(model, "model_dir", None)
    if model_dir:
        for name in ("vocab.txt", "label_dict.txt", "dict.txt"):
            src = os.path.join(model_dir, name)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(args.out, "ocr_vocab.txt"))
                break
    print(f"exported {len(sd)} tensors to {args.out}")


if __name__ == "__main__":
    main()
