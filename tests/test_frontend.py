"""Front-end tests: YOLO11 forward/NMS/converter coverage, ConvNeXt OCR,
legacy transformer OCR, windowed masking."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from marconet_tpu.models.convnext_ocr import ConvNeXtOCR, decode_ctc
from marconet_tpu.models.frontend import letterbox, mask_segment
from marconet_tpu.models.legacy_ocr import LegacyTransformerOCR
from marconet_tpu.models.yolo import YOLO11, nms_static


class TestYOLO11:
    @pytest.fixture(scope="class")
    def yolo(self):
        m = YOLO11(nc=1)
        x = jnp.zeros((1, 192, 192, 3))
        variables = m.init(jax.random.PRNGKey(0), x)
        return m, variables

    def test_forward_shapes(self, yolo):
        m, variables = yolo
        x = jnp.zeros((1, 192, 192, 3))
        boxes, scores = m.apply(variables, x)
        a = (192 // 8) ** 2 + (192 // 16) ** 2 + (192 // 32) ** 2
        assert boxes.shape == (1, a, 4)
        assert scores.shape == (1, a, 1)
        assert float(scores.min()) >= 0 and float(scores.max()) <= 1

    def test_converter_covers_module_tree(self, yolo):
        """Every leaf of the module tree must be produced by the
        ultralytics key mapping, with matching shapes."""
        from marconet_tpu.convert.yolo_import import convert_yolo11
        from tests.yolo_spec import ultralytics_state_spec

        _, variables = yolo
        sd = {k: np.zeros(shape, np.float32) + 0.5
              for k, shape in ultralytics_state_spec().items()}
        # BN running_var must be positive
        for k in sd:
            if "running_var" in k:
                sd[k][:] = 1.0
        converted = convert_yolo11(sd)

        def paths(tree, prefix=""):
            out = {}
            for k, v in tree.items():
                p = f"{prefix}/{k}"
                if isinstance(v, dict):
                    out.update(paths(v, p))
                else:
                    out[p] = np.asarray(v).shape
            return out

        want_p = paths(variables["params"])
        got_p = paths(converted["params"])
        missing = set(want_p) - set(got_p)
        extra = set(got_p) - set(want_p)
        assert not missing, f"converter missing params: {sorted(missing)[:8]}"
        assert not extra, f"converter extra params: {sorted(extra)[:8]}"
        for k in want_p:
            assert want_p[k] == got_p[k], (k, want_p[k], got_p[k])

        want_s = paths(variables["batch_stats"])
        got_s = paths(converted["batch_stats"])
        assert set(want_s) == set(got_s), (
            sorted(set(want_s) ^ set(got_s))[:8])

    def test_nms_static(self):
        boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11],
                             [50, 0, 60, 10], [100, 0, 110, 10]],
                            jnp.float32)
        scores = jnp.asarray([0.9, 0.8, 0.5, 0.05], jnp.float32)
        b, s, valid = nms_static(boxes, scores, max_det=4,
                                 iou_thresh=0.3, conf_thresh=0.07)
        v = np.asarray(valid)
        # box1 suppressed by box0 (IoU>0.3); box3 below conf
        assert v.sum() == 2
        kept = np.asarray(b)[v > 0]
        assert {tuple(k) for k in kept[:, :2].astype(int).tolist()} == \
            {(0, 0), (50, 0)}


class TestConvNeXtOCR:
    def test_forward_and_decode(self):
        m = ConvNeXtOCR(num_classes=40)
        x = jnp.zeros((1, 32, 96, 3))
        variables = m.init(jax.random.PRNGKey(0), x)
        logits = m.apply(variables, x)
        assert logits.shape == (1, 96 // 8, 40)
        texts = decode_ctc(np.asarray(logits), charset="abcdefghij" * 4)
        assert isinstance(texts[0], str)

    def test_ctc_decode_collapse(self):
        # T=5, C=4 (blank=3): argmax sequence a a blank b b -> "ab"
        logits = np.full((1, 5, 4), -10.0, np.float32)
        for t, c in enumerate([0, 0, 3, 1, 1]):
            logits[0, t, c] = 10.0
        assert decode_ctc(logits, charset="abc")[0] == "ab"


class TestLegacyOCR:
    def test_forward_shapes(self):
        m = LegacyTransformerOCR(vocab=50)
        img = jnp.zeros((1, 32, 64, 3))
        text = jnp.zeros((1, 6), jnp.int32)
        variables = m.init(jax.random.PRNGKey(0), img, text)
        logits = m.apply(variables, img, text)
        assert logits.shape == (1, 6, 50)

    def test_causality(self):
        """Changing a later input token must not affect earlier logits."""
        m = LegacyTransformerOCR(vocab=50)
        img = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (1, 32, 64, 3)).astype(np.float32))
        t1 = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
        t2 = jnp.asarray([[1, 2, 9, 9]], jnp.int32)
        variables = m.init(jax.random.PRNGKey(0), img, t1)
        l1 = np.asarray(m.apply(variables, img, t1))
        l2 = np.asarray(m.apply(variables, img, t2))
        np.testing.assert_allclose(l1[:, :2], l2[:, :2], atol=1e-5)
        assert not np.allclose(l1[:, 2:], l2[:, 2:])


class TestMasking:
    def test_letterbox_roundtrip(self):
        img = np.zeros((100, 400, 3), np.uint8)
        out, r, (top, left) = letterbox(img, 640)
        assert out.shape == (640, 640, 3)
        assert abs(r - 1.6) < 1e-6
        assert top == (640 - 160) // 2

    def test_mask_segment_window(self):
        img = np.full((32, 300, 3), 200, np.uint8)
        boxes = [[i * 30, 0, i * 30 + 25, 32] for i in range(8)]
        seg, start = mask_segment(img, boxes, j=4)
        assert start == 2  # window = boxes 2..6
        # segment spans boxes 2..6
        assert seg.shape[1] == boxes[6][2] - boxes[2][0]
        seg0, start0 = mask_segment(img, boxes, j=0)
        assert start0 == 0
