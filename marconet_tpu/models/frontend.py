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


def letterbox(img: np.ndarray, size: int = 640
              ) -> Tuple[np.ndarray, float, Tuple[int, int]]:
    """Aspect-preserving resize + gray pad to (size, size)."""
    import cv2

    h, w = img.shape[:2]
    r = min(size / h, size / w)
    nh, nw = int(round(h * r)), int(round(w * r))
    resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    top = (size - nh) // 2
    left = (size - nw) // 2
    out = np.full((size, size, 3), 114, np.uint8)
    out[top:top + nh, left:left + nw] = resized
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


class CharacterFrontend:
    """YOLO11 detector + ConvNeXt recognizer, checkpoint-driven."""

    def __init__(self, yolo_variables, ocr_variables=None,
                 conf: float = 0.07, iou: float = 0.1,
                 imgsz: int = 640, max_det: int = 100):
        import jax
        import jax.numpy as jnp

        from marconet_tpu.models.convnext_ocr import ConvNeXtOCR
        from marconet_tpu.models.yolo import YOLO11, nms_static

        self.conf, self.iou, self.imgsz = conf, iou, imgsz
        self.max_det = max_det
        self._yolo = YOLO11(nc=1)
        self._ocr = ConvNeXtOCR() if ocr_variables is not None else None
        self._yolo_vars = yolo_variables
        self._ocr_vars = ocr_variables

        @jax.jit
        def detect(img01):
            boxes, scores = self._yolo.apply(self._yolo_vars, img01)
            return nms_static(boxes[0], scores[0, :, 0],
                              max_det=max_det, iou_thresh=iou,
                              conf_thresh=conf)

        self._detect = detect
        if self._ocr is not None:
            @jax.jit
            def recognize(img01):
                return self._ocr.apply(self._ocr_vars, img01)

            self._recognize = recognize

    @classmethod
    def from_checkpoints(cls, ckpt_dir: str, **kw) -> "CharacterFrontend":
        from marconet_tpu.convert.yolo_import import load_yolo_checkpoint

        yolo_path = None
        for name in ("yolo11m_character_sd.pth", "yolo11m_character.pt"):
            cand = os.path.join(ckpt_dir, name)
            if os.path.exists(cand):
                yolo_path = cand
                break
        if yolo_path is None:
            raise FileNotFoundError(
                f"no YOLO checkpoint under {ckpt_dir}")
        import jax.numpy as jnp
        import jax

        yolo_vars = jax.tree.map(jnp.asarray,
                                 load_yolo_checkpoint(yolo_path))
        ocr_vars = None  # ModelScope recognizer weights are optional
        return cls(yolo_vars, ocr_vars, **kw)

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

    def recognize_segment(self, segment_bgr_or_rgb: np.ndarray) -> str:
        import cv2
        import jax.numpy as jnp

        from marconet_tpu.models.convnext_ocr import decode_ctc

        if self._ocr is None:
            return ""
        seg = segment_bgr_or_rgb
        h = seg.shape[0]
        w = max(int(seg.shape[1] * 32 / h), 8)
        seg = cv2.resize(seg, (w, 32), interpolation=cv2.INTER_LINEAR)
        # pad width to a multiple of 32 for the trunk
        pad = (-seg.shape[1]) % 32
        if pad:
            seg = np.pad(seg, ((0, 0), (0, pad), (0, 0)), mode="edge")
        logits = self._recognize(
            jnp.asarray(seg[None].astype(np.float32) / 255.0))
        return decode_ctc(logits)[0].replace(" ", "")

    # -- full pipeline -----------------------------------------------------

    def __call__(self, img_rgb: np.ndarray) -> FrontendResult:
        boxes = self.detect_boxes(img_rgb)
        chars: List[str] = []
        centers: List[int] = []
        for j, box in enumerate(boxes):
            seg, start = mask_segment(img_rgb, boxes, j)
            text = self.recognize_segment(seg)
            if len(text) > 0:
                chars.append(text[min(j - start, len(text) - 1)])
            else:
                chars.append("")
            centers.append(int((box[0] + box[2]) // 2))
        locs = normalized_locs_from_boxes(boxes, img_rgb.shape[0])
        return FrontendResult(boxes=boxes, chars=chars,
                              text="".join(chars), locs=locs,
                              x_centers=centers)
