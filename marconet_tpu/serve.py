"""Service-mode batched restoration.

The reference processes one text line per python iteration
(``test_sr.py:77``) and tells users to crop long lines themselves
(``test_sr.py:104-110``). For production serving and multi-region pages
(SURVEY.md §5.7), this module batches arbitrary collections of line crops
into a few fixed batch-size buckets — one compiled XLA program per bucket
— and splits over-wide lines into <=512 px segments automatically, so a
whole page is a handful of device launches regardless of layout.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from marconet_tpu.alphabet import BLANK_INDEX, labels_from_text
from marconet_tpu.models.encoder import MAX_CHARS
from marconet_tpu.utils.image import (LQ_HEIGHT, LQ_WIDTH,
                                      normalized_locs_from_boxes,
                                      preprocess_line)

DEFAULT_BUCKETS = (1, 4, 16, 64)


_PACK_JIT = None


def _pack_uint8(x):
    """[-1, 1] float/bf16 image tensor -> uint8 RGB, on device (jitted
    once: fuses into one elementwise pass; round-to-nearest)."""
    global _PACK_JIT
    if _PACK_JIT is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def pack(x):
            return (jnp.clip(x.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)
                    * 255.0 + 0.5).astype(jnp.uint8)

        _PACK_JIT = pack
    return _PACK_JIT(x)


@dataclass
class LineRequest:
    """One text-line crop with (optionally) known text and boxes."""

    image: np.ndarray                     # (H, W, 3) RGB uint8
    text: Optional[str] = None            # known characters (manual mode)
    boxes: Optional[Sequence[Sequence[float]]] = None  # xyxy, image coords


@dataclass
class LineResult:
    sr: np.ndarray                        # (128, W*4, 3) uint8 RGB
    text: str
    priors: np.ndarray                    # (n, 128, 128, 3) uint8


def split_wide_line(img: np.ndarray, max_w: int = LQ_WIDTH
                    ) -> List[Tuple[np.ndarray, int]]:
    """Split a line whose h=32-normalized width exceeds 512 px into
    segments; returns [(crop, x_offset_px)]."""
    h, w = img.shape[:2]
    w32 = int(w * LQ_HEIGHT / h)
    if w32 <= max_w:
        return [(img, 0)]
    n_seg = int(np.ceil(w32 / max_w))
    seg_w = int(np.ceil(w / n_seg))
    return [(img[:, i * seg_w:(i + 1) * seg_w], i * seg_w)
            for i in range(n_seg)]


class TextPageRestorer:
    """Bucketed batch restoration over the jitted pipeline."""

    def __init__(self, net, params, frontend=None,
                 buckets: Sequence[int] = DEFAULT_BUCKETS):
        self.net = net
        self.params = params
        self.frontend = frontend
        self.buckets = tuple(sorted(buckets))

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _prepare(self, req: LineRequest):
        pre = preprocess_line(req.image)
        if pre is None:
            raise ValueError("line wider than 512 after h=32 resize; "
                             "use restore_page for auto-splitting")
        lq, show, ori_w = pre

        if req.text is not None:
            labels_list = [l for l in labels_from_text(req.text)
                           if l >= 0][:MAX_CHARS]
            locs_vec = None
            if req.boxes is not None:
                locs_vec = normalized_locs_from_boxes(
                    req.boxes, req.image.shape[0])
        elif self.frontend is not None:
            det = self.frontend(req.image)
            labels_list = [l for l in labels_from_text(det.text)
                           if l >= 0][:MAX_CHARS]
            locs_vec = det.locs
        else:
            raise ValueError("request has no text and no front-end is "
                             "configured")
        n = len(labels_list)
        labels = np.full(MAX_CHARS, BLANK_INDEX, np.int32)
        labels[:n] = labels_list
        locs = np.zeros(2 * MAX_CHARS, np.float32)
        if locs_vec is not None:
            locs[:min(len(locs_vec), 2 * MAX_CHARS)] = \
                locs_vec[:2 * MAX_CHARS]
        mask = np.zeros(MAX_CHARS, np.float32)
        mask[:n] = 1.0
        return lq[0], labels, locs, mask, show, n

    def restore_lines(self, requests: Sequence[LineRequest]
                      ) -> List[LineResult]:
        """Restore a batch of lines with at most
        ``len(buckets)`` compiled programs. Character-slot count is also
        bucketed (4/8/16): masked extra slots are semantically inert
        (equivalent to a narrower run up to float reassociation noise;
        tests/test_models.py), so short lines skip the wasted prior/SFT
        compute.

        The chunk loop is double-buffered around JAX's async dispatch:
        chunk k's restore is dispatched (non-blocking), THEN chunk k-1's
        device->host transfer is drained and chunk k+1's host prep (cv2
        resizes + numpy stacking, the dominant host cost —
        BENCH_NOTES.md serve section) runs — all while the device
        executes chunk k. The strictly sequential prep -> dispatch ->
        block order would leave the device idle during every prep."""
        import jax.numpy as jnp

        from marconet_tpu.alphabet import text_from_labels

        n = len(requests)
        if n == 0:
            return []
        b = self._bucket(n)
        results: List[LineResult] = []

        def drain(sr_dev, priors_dev, chunk, reqs):
            # np.asarray on a device array blocks until the dispatched
            # program finished and the (uint8-packed) bytes arrived
            sr = np.asarray(sr_dev)
            priors = np.asarray(priors_dev)
            for i, (c, req) in enumerate(zip(chunk, reqs)):
                show, n_chars = c[4], c[5]
                results.append(LineResult(
                    sr=sr[i, :, :show.shape[1]],
                    text=req.text if req.text is not None else
                    text_from_labels([l for l in c[1][:n_chars]]),
                    priors=priors[i, :n_chars]))

        pending = None
        for chunk_start in range(0, n, b):
            reqs = requests[chunk_start:chunk_start + b]
            # host prep of THIS chunk overlaps the device execution of
            # the previous one (its results are not pulled yet)
            chunk = [self._prepare(r) for r in reqs]
            pad = b - len(chunk)
            max_chars = max(c[5] for c in chunk)
            n_slots = next(s for s in (4, 8, MAX_CHARS)
                           if s >= max_chars)
            lq = np.stack([c[0] for c in chunk] +
                          [np.zeros_like(chunk[0][0])] * pad)
            labels = np.stack([c[1][:n_slots] for c in chunk] +
                              [np.full(n_slots, BLANK_INDEX,
                                       np.int32)] * pad)
            locs = np.stack([c[2][:2 * n_slots] for c in chunk] +
                            [np.zeros(2 * n_slots, np.float32)] * pad)
            mask = np.stack([c[3][:n_slots] for c in chunk] +
                            [np.zeros(n_slots, np.float32)] * pad)
            out = self.net.restore(self.params, jnp.asarray(lq),
                                   jnp.asarray(labels), jnp.asarray(locs),
                                   jnp.asarray(mask))
            # uint8 packing happens ON DEVICE: one fused elementwise
            # pass, then a 4x smaller host transfer with no host-side
            # bf16->f32 conversion — at bucket 16 this cuts ~100 MB of
            # tunnel traffic per batch to ~25 MB (BENCH_NOTES.md round-5
            # serve section). Both calls are async dispatches.
            sr_dev = _pack_uint8(out.sr)
            priors_dev = _pack_uint8(out.priors)
            if pending is not None:
                drain(*pending)
            pending = (sr_dev, priors_dev, chunk, reqs)
        drain(*pending)
        return results

    def _page_requests(self, page_rgb: np.ndarray,
                       line_boxes: Sequence[Sequence[int]],
                       texts: Optional[Sequence[str]],
                       char_boxes) -> Tuple[List[LineRequest],
                                            List[List[int]]]:
        """Build per-segment requests for a page.

        Over-wide lines are split into <=512 px segments
        (``split_wide_line``); a known text is divided among the segments
        by the x-range each character's box center falls into (boxes
        shifted into segment coordinates), so every segment restores only
        its own characters. Returns the flat request list plus, per input
        line box, the request indices of its segments (in x order).
        """
        requests: List[LineRequest] = []
        groups: List[List[int]] = []
        for i, (x1, y1, x2, y2) in enumerate(line_boxes):
            crop = page_rgb[y1:y2, x1:x2]
            segs = split_wide_line(crop)
            text_i = None if texts is None else texts[i]
            cb = None if char_boxes is None else char_boxes[i]
            idxs: List[int] = []
            for k, (seg, xoff) in enumerate(segs):
                seg_w = seg.shape[1]
                if text_i is None:
                    # front-end mode: detection runs per segment
                    req = LineRequest(image=seg)
                elif len(segs) == 1:
                    req = LineRequest(image=seg, text=text_i, boxes=cb)
                elif cb is not None:
                    # assign each character to the segment containing its
                    # box center; first/last segments absorb out-of-range
                    # centers so no character is dropped
                    chars: List[str] = []
                    boxes: List[Tuple[float, float, float, float]] = []
                    for ch, (bx1, by1, bx2, by2) in zip(text_i, cb):
                        c = (bx1 + bx2) / 2.0
                        in_seg = xoff <= c < xoff + seg_w
                        in_seg |= (k == 0 and c < xoff)
                        in_seg |= (k == len(segs) - 1 and c >= xoff + seg_w)
                        if in_seg:
                            boxes.append((max(bx1 - xoff, 0.0), by1,
                                          min(bx2 - xoff, float(seg_w)),
                                          by2))
                            chars.append(ch)
                    req = LineRequest(image=seg, text="".join(chars),
                                      boxes=boxes)
                elif self.frontend is not None:
                    # no character geometry: fall back to per-segment
                    # detection rather than forcing the whole line's text
                    # into each segment at bogus locations
                    req = LineRequest(image=seg)
                else:
                    raise ValueError(
                        f"line {i} needs splitting into {len(segs)} "
                        "segments, but its text cannot be divided: pass "
                        "char_boxes (xyxy in line-crop coordinates, "
                        "reading order) or configure a front-end")
                idxs.append(len(requests))
                requests.append(req)
            groups.append(idxs)
        return requests, groups

    def restore_page(self, page_rgb: np.ndarray,
                     line_boxes: Sequence[Sequence[int]],
                     texts: Optional[Sequence[str]] = None,
                     char_boxes: Optional[Sequence[Optional[
                         Sequence[Sequence[float]]]]] = None
                     ) -> List[LineResult]:
        """Restore all text regions of a page.

        Crops each line box, splits over-wide lines into <=512 px
        segments, restores everything through the bucketed batch path,
        and reassembles split segments — returning exactly ONE
        ``LineResult`` per input line box, its ``sr`` the stitched
        whole-line image (the reference instead refuses lines wider than
        512 px at height 32, ``test_sr.py:104-110``).

        Args:
          texts: optional known text per line (manual mode).
          char_boxes: optional per-line character boxes (xyxy, line-crop
            coordinates, reading order matching ``texts[i]``) used to
            divide a known text among segments. Without them, split
            lines fall back to the configured front-end.
        """
        requests, groups = self._page_requests(page_rgb, line_boxes,
                                               texts, char_boxes)
        seg_results = self.restore_lines(requests)
        out: List[LineResult] = []
        for idxs in groups:
            parts = [seg_results[j] for j in idxs]
            if len(parts) == 1:
                out.append(parts[0])
                continue
            out.append(LineResult(
                sr=np.concatenate([p.sr for p in parts], axis=1),
                text="".join(p.text for p in parts),
                priors=np.concatenate([p.priors for p in parts], axis=0)))
        return out
