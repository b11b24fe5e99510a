"""Golden-image regression vs the reference test sets.

The reference's de-facto verification is eyeballing outputs on
``Testsets/`` (SURVEY.md §4). This automates it: with the released
checkpoints converted and the reference test images available, restore
the ``LQsWithText`` pair in manual mode and require stable PSNR against
stored goldens. Skipped when checkpoints or test images are absent
(zero-egress CI).
"""

import os

import numpy as np
import pytest

CKPT_DIR = os.environ.get("MARCONET_CKPT_DIR", "checkpoints")
TESTSET = os.environ.get(
    "MARCONET_TESTSET", "/root/reference/Testsets/LQsWithText")
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

_NEEDED = ["net_transformer_encoder.pth", "net_prior_generation.pth",
           "net_sr.pth"]


def _ready():
    return (os.path.isdir(TESTSET) and
            all(os.path.exists(os.path.join(CKPT_DIR, n))
                for n in _NEEDED))


@pytest.mark.skipif(not _ready(),
                    reason="released checkpoints / test images not present")
def test_restores_match_goldens():
    import cv2
    import jax
    import jax.numpy as jnp

    from marconet_tpu.alphabet import BLANK_INDEX, labels_from_text
    from marconet_tpu.convert import load_reference_checkpoints
    from marconet_tpu.models.pipeline import MARCONet
    from marconet_tpu.utils.image import calculate_psnr, preprocess_line

    net = MARCONet()
    params = jax.tree.map(jnp.asarray, load_reference_checkpoints(CKPT_DIR))
    os.makedirs(GOLDEN_DIR, exist_ok=True)

    for name in sorted(os.listdir(TESTSET)):
        base, _ = os.path.splitext(name)
        text = base.split("_")[-1]
        img = cv2.cvtColor(cv2.imread(os.path.join(TESTSET, name)),
                           cv2.COLOR_BGR2RGB)
        pre = preprocess_line(img)
        assert pre is not None
        lq, show, _ = pre
        labels_list = [l for l in labels_from_text(text) if l >= 0][:16]
        n = len(labels_list)
        labels = np.full((1, 16), BLANK_INDEX, np.int32)
        labels[0, :n] = labels_list
        mask = np.zeros((1, 16), np.float32)
        mask[0, :n] = 1.0
        locs = np.zeros((1, 32), np.float32)
        out = net.restore(params, jnp.asarray(lq), jnp.asarray(labels),
                          jnp.asarray(locs), jnp.asarray(mask))
        pred = np.asarray(out.pred_locs, np.float32)
        locs[0, :2 * n] = pred[0, :2 * n]
        out = net.restore(params, jnp.asarray(lq), jnp.asarray(labels),
                          jnp.asarray(locs), jnp.asarray(mask))
        sr = np.clip(np.asarray(out.sr[0], np.float32) * 0.5 + 0.5,
                     0, 1) * 255.0

        golden_path = os.path.join(GOLDEN_DIR, f"{base}.png")
        if not os.path.exists(golden_path):
            cv2.imwrite(golden_path,
                        cv2.cvtColor(sr.astype(np.uint8),
                                     cv2.COLOR_RGB2BGR))
            continue  # first run records the golden
        golden = cv2.cvtColor(cv2.imread(golden_path),
                              cv2.COLOR_BGR2RGB).astype(np.float64)
        psnr = calculate_psnr(sr, golden)
        assert psnr > 45.0, f"{name}: drifted from golden ({psnr:.2f} dB)"
