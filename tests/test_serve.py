"""Service-mode batching tests."""

import numpy as np
import jax
import pytest

from marconet_tpu.models.pipeline import MARCONet
from marconet_tpu.serve import (LineRequest, TextPageRestorer,
                                split_wide_line)


def test_split_wide_line():
    img = np.zeros((64, 3000, 3), np.uint8)  # w32 = 1500 -> 3 segments
    segs = split_wide_line(img)
    assert len(segs) == 3
    assert sum(s.shape[1] for s, _ in segs) == 3000


def test_split_narrow_passthrough():
    img = np.zeros((64, 900, 3), np.uint8)  # w32 = 450 <= 512
    segs = split_wide_line(img)
    assert len(segs) == 1 and segs[0][1] == 0


class TestRestorerReduced:
    """Bucketed line/page restoration at reduced channel width —
    identical code path to full size (``MARCONet(width=...)`` scales
    channel plans only), small enough for the default suite."""

    def test_bucketed_restore_and_page(self):
        net = MARCONet(width=0.0625)
        params = jax.jit(net.init)(jax.random.PRNGKey(0))
        restorer = TextPageRestorer(net, params, buckets=(2,))
        rng = np.random.default_rng(0)
        reqs = [LineRequest(
            image=rng.integers(0, 255, (64, 800, 3)).astype(np.uint8),
            text="AB") for _ in range(3)]
        out = restorer.restore_lines(reqs)
        assert len(out) == 3
        for r in out:
            assert r.sr.shape[0] == 128
            assert r.priors.shape[0] == 2

        # page path: two line boxes, one over-wide (splits into segments)
        page = rng.integers(0, 255, (300, 3000, 3)).astype(np.uint8)
        boxes = [(0, 0, 900, 64), (0, 100, 3000, 164)]
        res = restorer.restore_page(page, boxes, texts=["AB", "CD"])
        # box 2 is w32 = 1450 -> 3 segments; total 1 + 3 results
        assert len(res) == 4
        assert all(r.sr.shape[0] == 128 for r in res)


@pytest.mark.slow
@pytest.mark.skipif(not __import__("os").environ.get("RUN_SLOW"),
                    reason="full-pipeline compile; set RUN_SLOW=1")
class TestRestorer:
    def test_bucketed_restore(self):
        net = MARCONet()
        params = net.init(jax.random.PRNGKey(0))
        restorer = TextPageRestorer(net, params, buckets=(2,))
        rng = np.random.default_rng(0)
        reqs = [LineRequest(
            image=rng.integers(0, 255, (64, 800, 3)).astype(np.uint8),
            text="AB") for _ in range(3)]
        out = restorer.restore_lines(reqs)
        assert len(out) == 3
        for r in out:
            assert r.sr.shape[0] == 128
            assert r.priors.shape[0] == 2
