"""Detection + recognition front-end.

TPU-native equivalent of the reference's YOLO+OCR step
(``utils/yolo_ocr_xloc.py:7-103``): detect character boxes with the JAX
YOLO11 (letterboxed 640, conf 0.07, iou 0.1), sort left-to-right, and for
each character crop a 5-box sliding window, soft-mask everything outside
the window boxes to the blurred mean background color, recognize the
masked segment with the ConvNeXt CTC recognizer, and pick the character
at the box's position in the segment. The masking/cropping stays
host-side numpy/cv2 (identical semantics); the two network forwards are
jit-compiled.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from marconet_tpu.utils.image import normalized_locs_from_boxes


@dataclass
class FrontendResult:
    boxes: np.ndarray          # (N, 4) xyxy int, sorted left-to-right
    chars: List[str]           # one per box ('' when unrecognized)
    text: str
    locs: np.ndarray           # (2N,) normalized (center, half-width)
    x_centers: List[int]


def letterbox(img: np.ndarray, size: int = 640, auto: bool = True,
              stride: int = 32
              ) -> Tuple[np.ndarray, float, Tuple[int, int]]:
    """Ultralytics ``LetterBox``: aspect-preserving resize + gray-114 pad.

    ``auto=True`` (the reference's effective mode — a single-image
    ``yolo_model([img_path])`` call runs the predictor with
    ``auto = same_shapes and model.pt``) pads each side only up to the
    next ``stride`` multiple instead of the full (size, size) square;
    padding is split center-wise with ultralytics' ``round(dw -/+ 0.1)``
    rule. Returns (padded image, scale r, (top, left) pad offsets).
    """
    import cv2

    h, w = img.shape[:2]
    r = min(size / h, size / w)
    nw, nh = int(round(w * r)), int(round(h * r))
    dw, dh = size - nw, size - nh
    if auto:
        dw, dh = dw % stride, dh % stride
    dw /= 2
    dh /= 2
    resized = img if (w, h) == (nw, nh) else cv2.resize(
        img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    out = cv2.copyMakeBorder(resized, top, bottom, left, right,
                             cv2.BORDER_CONSTANT, value=(114, 114, 114))
    return out, r, (top, left)


def mask_segment(img: np.ndarray, boxes: Sequence[Sequence[int]],
                 j: int, num_cropped_boxes: int = 5, expand_px: int = 1,
                 expand_edge: int = 12) -> Tuple[np.ndarray, int]:
    """Crop + soft-mask the 5-box window around box j (reference
    ``yolo_ocr_xloc.py:45-89``). Returns (masked segment, window start
    index)."""
    import cv2

    n = len(boxes)
    if n <= num_cropped_boxes:
        idxs = list(range(n))
    else:
        half = num_cropped_boxes // 2
        start = max(0, min(j - half, n - num_cropped_boxes))
        idxs = list(range(start, start + num_cropped_boxes))
    window = [boxes[i] for i in idxs]
    contains_last = (n - 1) in idxs

    x1 = min(b[0] for b in window)
    x2 = max(b[2] for b in window)
    if j == 0:
        x1 = max(x1 - expand_edge, 0)
    if contains_last:
        x2 = min(x2 + expand_edge, img.shape[1])
    seg = img[:, x1:x2].copy()

    mask = np.zeros(seg.shape[:2], np.uint8)
    for b in window:
        bx1 = max(b[0] - x1 - expand_px, 0)
        bx2 = min(b[2] - x1 + expand_px, x2 - x1)
        mask[:, bx1:bx2] = 255
    non_text = cv2.bitwise_not(mask)
    if np.count_nonzero(non_text) > 0:
        mean_color = np.array(cv2.mean(seg, mask=non_text)[:3], np.uint8)
    else:
        mean_color = np.array([255, 255, 255], np.uint8)
    mean_img = np.full(seg.shape, mean_color, np.uint8)
    alpha = (cv2.GaussianBlur(mask, (15, 15), 0).astype(np.float32)
             / 255.0)[..., None]
    return (seg * alpha + mean_img * (1 - alpha)).astype(np.uint8), idxs[0]


def prepare_segment(segment_rgb: np.ndarray,
                    canonical_width: Optional[int] = None) -> np.ndarray:
    """Resize a masked segment to the recognizer's input geometry.

    Height 32, aspect-preserving. With ``canonical_width`` (a loaded
    checkpoint's fixed pos_embed geometry, ``OCRConfig.canonical_width``)
    the output width is exactly that: narrower segments are edge-padded,
    wider ones squeezed — one jit compile ever, and the checkpoint's
    positional embedding is used verbatim. Without it (weight-free use)
    the width is padded to a multiple of 64 to bound recompiles; the
    model interpolates pos_embed as needed.
    """
    import cv2

    seg = segment_rgb
    h = seg.shape[0]
    w = max(int(seg.shape[1] * 32 / h), 8)
    if canonical_width is not None and w > canonical_width:
        w = canonical_width
    seg = cv2.resize(seg, (w, 32), interpolation=cv2.INTER_LINEAR)
    target = canonical_width if canonical_width is not None \
        else w + ((-w) % 64)
    if target > seg.shape[1]:
        seg = np.pad(seg, ((0, 0), (0, target - seg.shape[1]), (0, 0)),
                     mode="edge")
    return seg


# filenames searched for the exported ModelScope recognizer
# (tools/export_ocr_sd.py writes the first pair)
_OCR_SD_FILES = ("ocr_convnext_sd.pth", "ocr_recognition_sd.pth",
                 "pytorch_model.pt")
_OCR_VOCAB_FILES = ("ocr_vocab.txt", "vocab.txt")


class CharacterFrontend:
    """YOLO11 detector + ConvNextViT recognizer, checkpoint-driven.

    ``ocr_variables``/``ocr_config``/``ocr_charset`` come from
    ``convert.ocr_import.load_ocr_checkpoint`` + ``load_vocab``; without
    them recognition returns '' per box and callers fall back to the
    encoder's own CTC head (reference ``test_w.py:34-40`` path).
    """

    def __init__(self, yolo_variables, ocr_variables=None,
                 ocr_config=None, ocr_charset: Optional[str] = None,
                 conf: float = 0.07, iou: float = 0.1,
                 imgsz: int = 640, max_det: int = 100):
        import jax

        from marconet_tpu.models.convnext_ocr import ConvNextViT, OCRConfig
        from marconet_tpu.models.yolo import YOLO11, nms_static

        self.conf, self.iou, self.imgsz = conf, iou, imgsz
        self.max_det = max_det
        self._yolo = YOLO11(nc=1)
        self._yolo_vars = yolo_variables
        self._ocr = None
        self._ocr_vars = ocr_variables
        if ocr_variables is not None:
            cfg = ocr_config or OCRConfig()
            self._ocr = ConvNextViT(config=cfg)
            self._ocr_cfg = cfg
            self._ocr_charset = ocr_charset
            # first charset entry's class id (low ids = blank/specials)
            self._ocr_offset = max(
                0, cfg.num_classes - len(ocr_charset)) \
                if ocr_charset else 0

        # Weights are passed as jit ARGUMENTS, not closed over: a
        # closed-over concrete array is baked into the HLO as a literal
        # constant, which bloats the compile payload past remote-compile
        # request limits (the axon tunnel rejects the ~300 MB recognizer
        # proto with HTTP 413) and defeats compile-cache reuse across
        # checkpoints.
        @jax.jit
        def detect(yolo_vars, img01):
            boxes, scores = self._yolo.apply(yolo_vars, img01)
            return nms_static(boxes[0], scores[0, :, 0],
                              max_det=max_det, iou_thresh=iou,
                              conf_thresh=conf)

        self._detect = lambda img01: detect(self._yolo_vars, img01)
        if self._ocr is not None:
            @jax.jit
            def recognize(ocr_vars, img):
                return self._ocr.apply(ocr_vars, img)

            # greedy CTC needs only the per-frame argmax: take it ON
            # DEVICE and transfer (B, T) int32 instead of the full
            # (B, T, 6764) logits — a ~7000x smaller device-to-host
            # transfer per recognizer call (the logits transfer, not
            # the forward, dominated the per-line host time through
            # the remote tunnel; BENCH_NOTES.md round 5)
            @jax.jit
            def recognize_ids(ocr_vars, img):
                import jax.numpy as jnp

                return jnp.argmax(self._ocr.apply(ocr_vars, img),
                                  axis=-1).astype(jnp.int32)

            self._recognize = lambda img: recognize(self._ocr_vars, img)
            self._recognize_ids = lambda img: recognize_ids(
                self._ocr_vars, img)

    @classmethod
    def from_checkpoints(cls, ckpt_dir: str, **kw) -> "CharacterFrontend":
        from marconet_tpu.convert.yolo_import import load_yolo_checkpoint
        from marconet_tpu.convert.ocr_import import (load_ocr_checkpoint,
                                                     load_vocab)

        def find(names):
            for name in names:
                cand = os.path.join(ckpt_dir, name)
                if os.path.exists(cand):
                    return cand
            return None

        yolo_path = find(("yolo11m_character_sd.pth",
                          "yolo11m_character.pt"))
        if yolo_path is None:
            raise FileNotFoundError(
                f"no YOLO checkpoint under {ckpt_dir}")
        import jax.numpy as jnp
        import jax

        yolo_vars = jax.tree.map(jnp.asarray,
                                 load_yolo_checkpoint(yolo_path))

        ocr_vars = ocr_cfg = charset = None
        ocr_path, vocab_path = find(_OCR_SD_FILES), find(_OCR_VOCAB_FILES)
        if ocr_path is not None:
            ocr_vars, ocr_cfg = load_ocr_checkpoint(ocr_path)
            ocr_vars = jax.tree.map(jnp.asarray, ocr_vars)
            charset = load_vocab(vocab_path) if vocab_path else None
            print(f"frontend: loaded OCR recognizer "
                  f"{os.path.basename(ocr_path)} "
                  f"({ocr_cfg.num_classes} classes, "
                  f"vocab={'yes' if charset else 'MISSING'})")
        else:
            print(f"frontend: no OCR recognizer weights under {ckpt_dir} "
                  f"(expected one of {_OCR_SD_FILES}; export with "
                  "tools/export_ocr_sd.py) — falling back to the "
                  "encoder's CTC head for recognition")
        return cls(yolo_vars, ocr_vars, ocr_config=ocr_cfg,
                   ocr_charset=charset, **kw)

    # -- detection ---------------------------------------------------------

    def detect_boxes(self, img_rgb: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        padded, r, (top, left) = letterbox(img_rgb, self.imgsz)
        inp = jnp.asarray(padded[None].astype(np.float32) / 255.0)
        boxes, scores, valid = map(np.asarray, self._detect(inp))
        keep = valid > 0
        boxes = boxes[keep]
        boxes[:, [0, 2]] = (boxes[:, [0, 2]] - left) / r
        boxes[:, [1, 3]] = (boxes[:, [1, 3]] - top) / r
        h, w = img_rgb.shape[:2]
        boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, w)
        boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, h)
        boxes = boxes.astype(int)
        return boxes[np.argsort(boxes[:, 0])]

    def recognize_segment(self, segment_rgb: np.ndarray) -> str:
        import jax.numpy as jnp

        from marconet_tpu.alphabet import ALPHABET
        from marconet_tpu.models.convnext_ocr import decode_ctc

        if self._ocr is None:
            return ""
        seg = prepare_segment(segment_rgb, self._ocr_cfg.canonical_width)
        # normalization matches the export manifest's __meta__ contract
        # (tools/export_ocr_sd.py) and the ConvNextViT docstring
        x = seg[None].astype(np.float32) / 255.0
        x = (x - 0.5) / 0.5
        logits = self._recognize(jnp.asarray(x))
        charset = self._ocr_charset or ALPHABET
        text = decode_ctc(logits, charset=charset,
                          blank=self._ocr_cfg.blank_index,
                          offset=self._ocr_offset)[0]
        return text.replace(" ", "")

    def recognize_segments(self,
                           segments: Sequence[np.ndarray]) -> List[str]:
        """Recognize N masked segments in batched recognizer calls.

        The per-character loop of the reference
        (``utils/yolo_ocr_xloc.py:41-97``) issues one recognizer forward
        per box; with the canonical-width geometry every prepared
        segment has the same (32, W, 3) shape, so a whole line's windows
        run as ONE jitted forward. Segments are grouped by prepared
        width (a single group under a loaded checkpoint; the weight-free
        64-multiple widths bucket naturally) and the batch dim is padded
        to the next power of two so at most ~log2(max_det) programs are
        ever compiled. Row-independent ops only (LayerNorm/attention are
        per-sample), so the result equals the per-segment path —
        asserted in tests/test_frontend.py.
        """
        import jax.numpy as jnp

        from marconet_tpu.alphabet import ALPHABET
        from marconet_tpu.models.convnext_ocr import decode_ctc_ids

        if self._ocr is None or len(segments) == 0:
            return ["" for _ in segments]
        cw = self._ocr_cfg.canonical_width
        prepared = [prepare_segment(s, cw) for s in segments]
        charset = self._ocr_charset or ALPHABET
        out: List[Optional[str]] = [None] * len(prepared)
        by_width = {}
        for i, seg in enumerate(prepared):
            by_width.setdefault(seg.shape[1], []).append(i)
        for idxs in by_width.values():
            x = np.stack([prepared[i] for i in idxs]).astype(np.float32)
            x = (x / 255.0 - 0.5) / 0.5
            n = len(idxs)
            nb = 1 << (n - 1).bit_length()  # bucket: 1,2,4,8,...
            if nb > n:
                x = np.concatenate(
                    [x, np.zeros((nb - n,) + x.shape[1:], x.dtype)])
            ids = self._recognize_ids(jnp.asarray(x))
            texts = decode_ctc_ids(np.asarray(ids)[:n], charset=charset,
                                   blank=self._ocr_cfg.blank_index,
                                   offset=self._ocr_offset)
            for i, t in zip(idxs, texts):
                out[i] = t.replace(" ", "")
        return out  # type: ignore[return-value]

    # -- full pipeline -----------------------------------------------------

    def __call__(self, img_rgb: np.ndarray) -> FrontendResult:
        boxes = self.detect_boxes(img_rgb)
        segs, starts = [], []
        for j in range(len(boxes)):
            seg, start = mask_segment(img_rgb, boxes, j)
            segs.append(seg)
            starts.append(start)
        texts = self.recognize_segments(segs)
        chars: List[str] = []
        centers: List[int] = []
        for j, (box, start, text) in enumerate(zip(boxes, starts, texts)):
            if len(text) > 0:
                chars.append(text[min(j - start, len(text) - 1)])
            else:
                chars.append("")
            centers.append(int((box[0] + box[2]) // 2))
        locs = normalized_locs_from_boxes(boxes, img_rgb.shape[0])
        return FrontendResult(boxes=boxes, chars=chars,
                              text="".join(chars), locs=locs,
                              x_centers=centers)
