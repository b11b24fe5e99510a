"""Host-side image pre/post-processing for the inference CLIs.

Stays on CPU with cv2 for byte-level parity with the reference's
preprocessing (``test_sr.py:98-115``): cubic resize to height 32, zero-pad
to width 512, scale to [0,1] then normalize to [-1,1].
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover - cv2 is expected in this image
    cv2 = None

LQ_HEIGHT = 32
LQ_WIDTH = 512
SR_SCALE = 4
SHOW_HEIGHT = 128
MAX_WIDTH = SHOW_HEIGHT * 16  # 2048


def preprocess_line(img_rgb: np.ndarray):
    """RGB uint8 (H, W, 3) -> model input + display copies.

    Returns (lq (1,32,512,3) float32 in [-1,1], show_lq (128, 4W', 3)
    uint8-scale float, ori_lq_width) or None when the line is too wide
    (reference warns and skips, ``test_sr.py:104-110``).
    """
    h = img_rgb.shape[0]
    show = cv2.resize(img_rgb, (0, 0), fx=SHOW_HEIGHT / h, fy=SHOW_HEIGHT / h,
                      interpolation=cv2.INTER_CUBIC)
    lq = cv2.resize(img_rgb, (0, 0), fx=LQ_HEIGHT / h, fy=LQ_HEIGHT / h,
                    interpolation=cv2.INTER_CUBIC)
    ori_w = lq.shape[1]
    if ori_w > LQ_WIDTH:
        return None
    canvas = np.zeros((LQ_HEIGHT, LQ_WIDTH, 3), lq.dtype)
    canvas[:, :ori_w] = lq
    x = canvas.astype(np.float32) / 255.0
    x = (x - 0.5) / 0.5
    return x[None], show, ori_w


def postprocess_sr(sr: np.ndarray, show_width: int) -> np.ndarray:
    """(128, 2048, 3) in [-1,1] -> RGB float [0,255], cropped to content."""
    img = np.clip(sr * 0.5 + 0.5, 0, 1) * 255.0
    return img[:, :show_width]


def normalized_locs_from_boxes(boxes: Sequence[Sequence[float]],
                               src_height: int) -> np.ndarray:
    """YOLO xyxy boxes (original image coords) -> (2N,) normalized locs.

    Mirrors reference ``test_sr.py:121-135``: centers/half-widths are
    rescaled to the height-32 LQ geometry and divided by the padded width.
    """
    locs = np.zeros(2 * len(boxes), np.float32)
    for i, (x1, _, x2, _) in enumerate(boxes):
        center = (x1 + x2) / 2.0 * LQ_HEIGHT / src_height
        half = (x2 - x1) / 2.0 * LQ_HEIGHT / src_height
        locs[2 * i] = center / LQ_WIDTH
        locs[2 * i + 1] = half / LQ_WIDTH
    return locs


def draw_boxes(show_lq: np.ndarray, locs: np.ndarray,
               n_chars: int) -> np.ndarray:
    """Overlay predicted box markers (reference ``test_sr.py:214-231``):
    red verticals at x = center-width on the top half, blue at
    x = center+width on the bottom half."""
    img = show_lq.copy()
    w_max = MAX_WIDTH
    for c in range(n_chars):
        center = int(locs[2 * c] * w_max)
        width = int(locs[2 * c + 1] * w_max)
        x, y = center - width, center + width
        xs = slice(max(0, x - 2), min(x + 2, w_max))
        ys = slice(max(0, y - 1), min(y + 1, w_max))
        img[:64, xs, :] = [255, 0, 0]
        img[64:, ys, :] = [0, 0, 255]
    return img


def stack_collage(show_lq: np.ndarray, show_locs: np.ndarray,
                  show_sr: np.ndarray, priors: np.ndarray,
                  n_chars: int) -> np.ndarray:
    """4-row output collage: LQ / box overlay / SR / glyph priors
    (reference ``test_sr.py:204-232``), RGB."""
    width = show_lq.shape[1]
    prior_row = np.concatenate([priors[i] for i in range(n_chars)], axis=1) \
        if n_chars else np.zeros((128, width, 3), np.float32)
    prior_row = np.clip(prior_row * 0.5 + 0.5, 0, 1)
    prior_row = cv2.resize(prior_row, (width, show_lq.shape[0])) * 255.0
    rows = [show_lq.astype(np.float32), show_locs.astype(np.float32),
            show_sr.astype(np.float32), prior_row.astype(np.float32)]
    return np.concatenate(rows, axis=0)


# ---------------------------------------------------------------------------
# metrics (reference keeps helpers in Train/util/utils_image.py:622,643)
# ---------------------------------------------------------------------------


def calculate_psnr(img1: np.ndarray, img2: np.ndarray,
                   border: int = 0) -> float:
    """PSNR on uint8-scale images (reference ``utils_image.py:622-639``)."""
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    if border:
        img1 = img1[border:-border, border:-border]
        img2 = img2[border:-border, border:-border]
    mse = np.mean((img1 - img2) ** 2)
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0 / np.sqrt(mse))


def _ssim_channel(img1: np.ndarray, img2: np.ndarray) -> float:
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.T)
    mu1 = cv2.filter2D(img1, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = cv2.filter2D(img1 ** 2, -1, window)[5:-5, 5:-5] - mu1_sq
    s2 = cv2.filter2D(img2 ** 2, -1, window)[5:-5, 5:-5] - mu2_sq
    s12 = cv2.filter2D(img1 * img2, -1, window)[5:-5, 5:-5] - mu1_mu2
    m = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return float(m.mean())


def calculate_ssim(img1: np.ndarray, img2: np.ndarray,
                   border: int = 0) -> float:
    """SSIM (reference ``utils_image.py:643-676``)."""
    if border:
        img1 = img1[border:-border, border:-border]
        img2 = img2[border:-border, border:-border]
    if img1.ndim == 2:
        return _ssim_channel(img1, img2)
    return float(np.mean([_ssim_channel(img1[..., c], img2[..., c])
                          for c in range(img1.shape[2])]))
