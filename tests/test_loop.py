"""Training-loop plumbing tests (no device step): batch workers, config."""

import numpy as np

from marconet_tpu.train.config import LoopConfig
from marconet_tpu.train.loop import BatchLoader


def test_batch_loader_produces_batches():
    cfg = LoopConfig(num_workers=1)
    loader = BatchLoader(cfg, global_batch=2, num_workers=1, prefetch=2)
    try:
        it = iter(loader)
        batch = next(it)
        assert batch["lq"].shape == (2, 32, 512, 3)
        assert batch["gt"].shape == (2, 128, 2048, 3)
        assert batch["gt_chars"].shape == (2, 16, 128, 128, 3)
        assert batch["char_valid"].sum() >= 2
        assert np.isfinite(batch["lq"]).all()
    finally:
        loader.close()
