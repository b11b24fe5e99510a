"""Shared tiny-batch fixture for train-step tests and subprocess workers
(kept torch-free: the multi-process workers import it on a 1-core host)."""

import numpy as np

from marconet_tpu.alphabet import BLANK_INDEX
from marconet_tpu.data.batch_prep import prepare_train_batch


def tiny_batch(rng, b=2, n_chars=16):
    w = 128 * n_chars
    gt = rng.uniform(-1, 1, (b, 128, w, 3)).astype(np.float32)
    mask = (rng.uniform(0, 1, (b, 128, w, 3)) > 0.7).astype(np.float32)
    lq = rng.uniform(-1, 1, (b, 32, w // 4, 3)).astype(np.float32)
    labels = np.full((b, n_chars), BLANK_INDEX, np.int64)
    box = np.zeros((b, 2 * n_chars), np.float32)
    for i in range(b):
        n = 3
        labels[i, :n] = rng.integers(0, 6735, n)
        lefts = np.sort(rng.uniform(0.0, 0.8, n))
        for c in range(n):
            box[i, 2 * c] = lefts[c]
            box[i, 2 * c + 1] = lefts[c] + 0.05
    return prepare_train_batch(gt, mask, labels, box, lq)
