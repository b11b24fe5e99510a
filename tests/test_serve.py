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

        # page path: two line boxes, one over-wide. The wide line's text
        # is divided among its segments by char-box center, and the
        # segments are reassembled into ONE result per input box.
        page = rng.integers(0, 255, (300, 3000, 3)).astype(np.uint8)
        boxes = [(0, 0, 900, 64), (0, 100, 3000, 164)]
        # box 2 is 3000 px at h=64 -> w32 = 1500 -> 3 segments of 1000 px
        wide_boxes = [(60 + 480 * i, 8, 420 + 480 * i, 56)
                      for i in range(6)]  # centers 240,720,...,2640
        res = restorer.restore_page(
            page, boxes, texts=["AB", "CDEFGH"],
            char_boxes=[None, wide_boxes])
        assert len(res) == 2
        assert all(r.sr.shape[0] == 128 for r in res)
        assert res[1].text == "CDEFGH"
        assert res[1].priors.shape[0] == 6
        # stitched whole-line SR: 3 segments x 1000 px at h=64 -> each
        # shows 4 * (1000 * 32 / 64) = 2000 px of x4 output
        assert res[1].sr.shape[1] == 3 * 2000

    def test_chunking_invariance(self):
        """Splitting a request list into multiple double-buffered chunks
        (round-5 async pipeline in ``restore_lines``) must return the
        same results in the same order as one big chunk. Batch rows are
        independent in every pipeline op, but XLA's codegen is
        batch-size-dependent (tiling/fusion reassociation), so a few
        pixels may flip by one uint8 quantization level — measured
        3 / 614400 at +-1 on XLA:CPU; anything beyond that is a
        chunking bug."""
        net = MARCONet(width=0.0625)
        params = jax.jit(net.init)(jax.random.PRNGKey(0))
        rng = np.random.default_rng(2)
        reqs = [LineRequest(
            image=rng.integers(0, 255, (64, 800, 3)).astype(np.uint8),
            text="ABC") for _ in range(5)]
        chunked = TextPageRestorer(net, params,
                                   buckets=(2,)).restore_lines(reqs)
        whole = TextPageRestorer(net, params,
                                 buckets=(8,)).restore_lines(reqs)
        assert len(chunked) == len(whole) == 5
        for c, w in zip(chunked, whole):
            assert c.text == w.text
            assert c.sr.shape == w.sr.shape
            d = np.abs(c.sr.astype(int) - w.sr.astype(int))
            assert d.max() <= 1 and (d > 0).mean() < 1e-3
            dp = np.abs(c.priors.astype(int) - w.priors.astype(int))
            assert dp.max() <= 1 and (dp > 0).mean() < 1e-3

    def test_page_request_splitting(self):
        restorer = TextPageRestorer(net=None, params=None)
        rng = np.random.default_rng(1)
        page = rng.integers(0, 255, (100, 3000, 3)).astype(np.uint8)
        boxes = [(0, 0, 3000, 64)]
        # centers: 100/900 (seg 0), 1100/1900 (seg 1), 2100/2950 (seg 2);
        # the last box pokes past the segment edge and must be clipped
        cb = [[(50, 0, 150, 60), (850, 0, 950, 60),
               (1050, 0, 1150, 60), (1850, 0, 1950, 60),
               (2050, 0, 2150, 60), (2920, 0, 2980, 60)]]
        reqs, groups = restorer._page_requests(
            page, boxes, texts=["ABCDEF"], char_boxes=cb)
        assert groups == [[0, 1, 2]]
        assert [r.text for r in reqs] == ["AB", "CD", "EF"]
        for r in reqs:
            for bx1, _, bx2, _ in r.boxes:
                assert 0 <= bx1 <= bx2 <= r.image.shape[1]
        # segment-local coordinates: seg 1 starts at x=1000
        assert reqs[1].boxes[0][0] == 50
        # front-end-less split with no char geometry must refuse loudly
        with pytest.raises(ValueError, match="char_boxes"):
            restorer._page_requests(page, boxes, texts=["ABCDEF"],
                                    char_boxes=None)


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


def test_pack_uint8_matches_host_conversion():
    """The on-device uint8 packing must equal the host-side reference
    conversion (clip to [-1,1] -> [0,255] round-to-nearest) — the
    round-5 serve transfer optimization must not change pixel values."""
    import jax.numpy as jnp

    from marconet_tpu.serve import _pack_uint8

    rng = np.random.default_rng(0)
    x = rng.uniform(-1.3, 1.3, (2, 8, 8, 3)).astype(np.float32)
    got = np.asarray(_pack_uint8(jnp.asarray(x)))
    want = np.floor(np.clip(x * 0.5 + 0.5, 0.0, 1.0) * 255.0
                    + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(got, want)
    assert got.dtype == np.uint8
    # bf16 inputs (the deployed dtype) stay in range and exact at the
    # 8-bit quantization level
    gb = np.asarray(_pack_uint8(jnp.asarray(x, jnp.bfloat16)))
    assert gb.dtype == np.uint8
    assert np.abs(gb.astype(int) - want.astype(int)).max() <= 2
