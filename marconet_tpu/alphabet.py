"""Character alphabet for the recognizer / codebook.

The alphabet is a data asset of 6735 characters (mostly simplified Chinese,
plus Latin letters, digits and punctuation). Index ``i`` in the string is the
class label of that character; class ``6735`` is the blank/empty class, so
the total class count is 6736.

Parity: reference ``utils/alphabets.py:1`` (identical copies at
``Train/alphabets.py`` and ``Train/tspgan/alphabets.py``);
``num_classes = 6736`` per reference ``models/networks.py:35`` and
``Train/options/train.yml:145``.
"""

from __future__ import annotations

import functools
import os
from typing import List

_ASSET = os.path.join(os.path.dirname(__file__), "assets", "alphabet.txt")


@functools.lru_cache(maxsize=1)
def _load() -> str:
    with open(_ASSET, encoding="utf-8") as f:
        return f.read()


ALPHABET: str = _load()
NUM_CLASSES: int = len(ALPHABET) + 1  # 6736; last class is blank/empty
BLANK_INDEX: int = len(ALPHABET)  # 6735


def labels_from_text(text: str) -> List[int]:
    """Map a string to class labels (-1 for out-of-alphabet characters).

    Mirrors ``get_labels_from_text`` (reference ``test_sr.py:24-29``), which
    uses ``str.find`` and therefore yields -1 for unknown characters.
    """
    return [ALPHABET.find(t) for t in text]


def text_from_labels(labels) -> str:
    """Map class labels back to a string (reference ``test_sr.py:31-35``)."""
    out = []
    for l in labels:
        l = int(l)
        if 0 <= l < len(ALPHABET):
            out.append(ALPHABET[l])
        elif l == BLANK_INDEX:
            out.append("")  # blank renders as nothing
        else:
            raise ValueError(f"label {l} out of range")
    return "".join(out)


def collapse_ctc_labels(class_logits) -> List[int]:
    """CTC-style collapse of per-token argmax predictions.

    Drops repeated consecutive labels and the blank class; mirrors
    ``clear_labels`` in reference ``test_w.py:34-40``.

    Args:
      class_logits: array of shape (T, num_classes) — per-token logits.
    Returns:
      list of collapsed class labels.
    """
    import numpy as np

    preds = np.asarray(class_logits).argmax(axis=1)
    labels = []
    for i, p in enumerate(preds):
        if i > 0 and preds[i - 1] == p:
            continue
        if p < len(ALPHABET):
            labels.append(int(p))
    return labels
