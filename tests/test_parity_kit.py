"""Rehearsal of the one-command parity kit (``tools/parity_report.py``).

Runs the kit end-to-end against FABRICATED reference-key checkpoints
(random weights on the exact released key layout, the same builders the
converter-parity tests use) and a synthetic testset, twice:

1. without ``--ref_outputs``: strict conversion + restore + golden
   recording must succeed, verdict ``NO_REFERENCE_OUTPUTS``;
2. with ``--ref_outputs`` pointing at run 1's goldens: the PSNR
   comparison path must fire and yield ``PARITY`` (identical pixels).

This proves the one-command path — strict converters, the double
restore, the collage/raw band handling, the JSON verdict schema —
before it ever meets real ``.pth`` files (reference flow:
``test_sr.py:43-51``). VERDICT r2 missing #5.
"""

import json
import os
import sys

import numpy as np
import pytest


def test_parity_report_end_to_end(tmp_path, monkeypatch):
    import cv2
    import torch

    from tests.torch_functional_oracle import (build_encoder_state,
                                               build_prior_state,
                                               build_srnet_state)

    rng = np.random.default_rng(3)
    ckpt_dir = tmp_path / "ckpts"
    ckpt_dir.mkdir()
    for name, builder in (("net_transformer_encoder.pth",
                           build_encoder_state),
                          ("net_prior_generation.pth", build_prior_state),
                          ("net_sr.pth", build_srnet_state)):
        sd = {k: torch.from_numpy(np.asarray(v, np.float32))
              for k, v in builder(rng).items()}
        torch.save({"params": sd}, ckpt_dir / name)

    testset = tmp_path / "testset"
    testset.mkdir()
    img = rng.integers(40, 220, (40, 200, 3), np.uint8)
    cv2.imwrite(str(testset / "line_01_AB.png"), img)

    golden_dir = tmp_path / "goldens"
    report1 = tmp_path / "report1.json"

    import tools.parity_report as pr

    def run(argv):
        monkeypatch.setattr(sys, "argv", ["parity_report.py"] + argv)
        pr.main()

    run(["--ckpt_dir", str(ckpt_dir), "--testset", str(testset),
         "--golden_dir", str(golden_dir), "--report", str(report1)])
    rep1 = json.loads(report1.read_text())
    assert rep1["verdict"] == "NO_REFERENCE_OUTPUTS"
    goldens = os.listdir(golden_dir)
    assert goldens == ["line_01_AB.png"]
    band = cv2.imread(str(golden_dir / goldens[0]))
    assert band is not None and band.shape[0] == 128

    report2 = tmp_path / "report2.json"
    run(["--ckpt_dir", str(ckpt_dir), "--testset", str(testset),
         "--golden_dir", str(golden_dir), "--report", str(report2),
         "--ref_outputs", str(golden_dir)])
    rep2 = json.loads(report2.read_text())
    assert rep2["verdict"] == "PARITY"
    assert "line_01_AB" in rep2["images"]
    assert rep2["mean_psnr_vs_reference"] >= 40.0
