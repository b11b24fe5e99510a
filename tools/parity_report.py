#!/usr/bin/env python
"""One-command numerical parity verdict against the released checkpoints.

Run on any machine that has the reference ``.pth`` files (this container
is zero-egress, so the checkpoints are absent here — the kit ships ready):

    python tools/parity_report.py --ckpt_dir checkpoints \
        [--testset /root/reference/Testsets/LQsWithText] \
        [--ref_outputs <dir of reference test_sr.py outputs>] \
        [--report parity_report.json]

Steps:
  1. STRICT-convert the three released checkpoints (every state-dict key
     must be consumed — ``convert.torch_import``); any rename/extra key
     fails the report immediately.
  2. Restore every ``LQsWithText`` image in manual-label mode (the
     reference's ``-m`` path needs no YOLO/OCR weights).
  3. If a directory of reference outputs is given, compare our SR band
     against the reference's (raw SR images, or the third 128-row band of
     the reference 4-row collage, ``test_sr.py:204-232``) and emit the
     BASELINE.json parity verdict: mean PSNR >= 40 dB => outputs are
     bit-close modulo dtype ("within 0.1 dB" on any downstream metric).
  4. Always (re)record tests/goldens/ so the golden regression test
     (tests/test_golden.py) is armed for future drift detection.

Prints a table + writes a JSON report with a machine-checkable verdict.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def restore_testset(ckpt_dir: str, testset: str):
    import cv2
    import jax
    import jax.numpy as jnp

    from marconet_tpu.alphabet import BLANK_INDEX, labels_from_text
    from marconet_tpu.convert import load_reference_checkpoints
    from marconet_tpu.models.pipeline import MARCONet
    from marconet_tpu.utils.image import preprocess_line

    net = MARCONet()
    params = jax.tree.map(jnp.asarray, load_reference_checkpoints(ckpt_dir))
    results = {}
    for name in sorted(os.listdir(testset)):
        base, ext = os.path.splitext(name)
        if ext.lower() not in (".png", ".jpg", ".jpeg", ".bmp"):
            continue
        text = base.split("_")[-1]
        img = cv2.cvtColor(cv2.imread(os.path.join(testset, name)),
                           cv2.COLOR_BGR2RGB)
        pre = preprocess_line(img)
        if pre is None:
            print(f"  skip {name}: wider than 512 after resize")
            continue
        lq, _, ori_w = pre
        labels_list = [l for l in labels_from_text(text) if l >= 0][:16]
        n = len(labels_list)
        if n == 0:
            continue
        labels = np.full((1, 16), BLANK_INDEX, np.int32)
        labels[0, :n] = labels_list
        mask = np.zeros((1, 16), np.float32)
        mask[0, :n] = 1.0
        locs = np.zeros((1, 32), np.float32)
        out = net.restore(params, jnp.asarray(lq), jnp.asarray(labels),
                          jnp.asarray(locs), jnp.asarray(mask))
        locs[0, :2 * n] = np.asarray(out.pred_locs, np.float32)[0, :2 * n]
        out = net.restore(params, jnp.asarray(lq), jnp.asarray(labels),
                          jnp.asarray(locs), jnp.asarray(mask))
        sr = np.clip(np.asarray(out.sr[0], np.float32) * 0.5 + 0.5,
                     0, 1) * 255.0
        results[base] = {"sr": sr, "ori_w": ori_w, "n_chars": n}
    return results


def reference_sr_band(path: str) -> np.ndarray:
    """Reference output -> SR pixels. Raw SR images pass through; 4-row
    collages (H = 4*128) yield the third band."""
    import cv2

    img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
    if img.shape[0] == 4 * 128:
        img = img[2 * 128:3 * 128]
    return img.astype(np.float64)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt_dir", default="checkpoints")
    parser.add_argument("--testset",
                        default="/root/reference/Testsets/LQsWithText")
    parser.add_argument("--ref_outputs", default=None,
                        help="directory of reference test_sr.py outputs "
                             "(raw SR images or 4-row collages)")
    parser.add_argument("--report", default="parity_report.json")
    parser.add_argument("--psnr_gate", type=float, default=40.0)
    parser.add_argument("--golden_dir", default=None,
                        help="where to record goldens (default: "
                             "tests/goldens of this repo)")
    args = parser.parse_args()

    from marconet_tpu.utils.image import calculate_psnr

    needed = ["net_transformer_encoder.pth", "net_prior_generation.pth",
              "net_sr.pth"]
    missing = [n for n in needed
               if not os.path.exists(os.path.join(args.ckpt_dir, n))]
    if missing:
        raise SystemExit(f"checkpoints missing under {args.ckpt_dir}: "
                         f"{missing}; fetch them with "
                         "tools/download_checkpoints.py")

    print("1/3 strict-converting checkpoints + restoring testset ...")
    results = restore_testset(args.ckpt_dir, args.testset)
    print(f"    restored {len(results)} images")

    report = {"ckpt_dir": args.ckpt_dir, "images": {}, "verdict": None}

    golden_dir = args.golden_dir or os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests", "goldens")
    os.makedirs(golden_dir, exist_ok=True)
    import cv2

    for base, r in results.items():
        cv2.imwrite(os.path.join(golden_dir, f"{base}.png"),
                    cv2.cvtColor(r["sr"].astype(np.uint8),
                                 cv2.COLOR_RGB2BGR))
    print(f"2/3 goldens recorded under {golden_dir}")

    if args.ref_outputs and os.path.isdir(args.ref_outputs):
        psnrs = []
        ref_names = os.listdir(args.ref_outputs)
        for base, r in results.items():
            match = [n for n in ref_names if n.startswith(base)]
            if not match:
                print(f"    no reference output for {base}")
                continue
            ref = reference_sr_band(
                os.path.join(args.ref_outputs, match[0]))
            ours = r["sr"][:, :ref.shape[1]]
            ref = ref[:, :ours.shape[1]]
            p = calculate_psnr(ours, ref)
            psnrs.append(p)
            report["images"][base] = {"psnr_vs_reference": round(p, 2)}
            print(f"    {base}: PSNR vs reference {p:.2f} dB")
        if psnrs:
            mean_psnr = float(np.mean(psnrs))
            report["mean_psnr_vs_reference"] = round(mean_psnr, 2)
            report["verdict"] = ("PARITY" if mean_psnr >= args.psnr_gate
                                 else "DIVERGED")
            print(f"3/3 verdict: {report['verdict']} "
                  f"(mean {mean_psnr:.2f} dB, gate {args.psnr_gate})")
    else:
        report["verdict"] = "NO_REFERENCE_OUTPUTS"
        print("3/3 no --ref_outputs given: goldens recorded; rerun the "
              "reference's test_sr.py and pass its output dir for the "
              "cross-implementation verdict")

    with open(args.report, "w") as f:
        json.dump(report, f, indent=1)
    print(f"report written to {args.report}")


if __name__ == "__main__":
    main()
