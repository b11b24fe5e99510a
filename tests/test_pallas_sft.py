"""Pallas SFT kernels vs the XLA reference path (interpreter mode on CPU).

The fused kernels (``ops/pallas_sft.py``) replace the masked AdaIN /
GroupNorm / write-back chains of the SFT fusion stage on TPU. These tests
pin them — at kernel level and through the full ``SFTFusion`` module —
against the XLA implementations that the CPU suite already validates
against the torch oracles (``tests/test_convert.py``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from marconet_tpu.ops import pallas_sft
from marconet_tpu.ops.layers import (adaptive_instance_norm, group_norm,
                                     swish)


@pytest.fixture
def force_interpret():
    pallas_sft.FORCE_INTERPRET = True
    yield
    pallas_sft.FORCE_INTERPRET = False


class TestKernels:
    B, H, W, C = 3, 16, 32, 128

    def _mask(self, lengths):
        cols = jnp.arange(self.W)
        m = (cols[None, :, None] <
             lengths[:, None, None]).astype(jnp.float32)
        return m[:, None, :, :]  # (B, 1, W, 1)

    def test_adain_gn_windows(self, rng):
        from marconet_tpu.models.srnet import (_gather_windows,
                                               _window_geometry)

        B, S, C, HW = 2, 4, 128, 8
        H, WIN, WIDTH = 16, 2 * HW, 128
        canvas = jnp.asarray(rng.standard_normal((B, H, WIDTH, C)),
                             jnp.float32)
        priors = jnp.asarray(rng.standard_normal((B, S, H, WIN, C)),
                             jnp.float32)
        locs = np.zeros((B, 2 * S), np.float32)
        locs[:, 0::2] = [0.01, 0.3, 0.62, 0.99]  # both truncated edges
        locs[:, 1::2] = 0.05
        locs = jnp.asarray(locs)
        gamma = jnp.asarray(rng.standard_normal(2 * C), jnp.float32)
        beta = jnp.asarray(rng.standard_normal(2 * C), jnp.float32)

        x1, L, y1 = _window_geometry(locs, HW, WIDTH)

        # XLA reference: pad + gather + crop + mask + adain + concat + gn
        padded = jnp.pad(canvas, ((0, 0), (0, 0), (0, WIN), (0, 0)))
        lq_win = _gather_windows(padded, x1, WIN)
        prior_pad = jnp.pad(priors,
                            ((0, 0), (0, 0), (0, 0), (0, WIN), (0, 0)))
        crop = lambda p, s: jax.lax.dynamic_slice_in_dim(p, s, WIN, axis=1)
        prior_win = jax.vmap(jax.vmap(crop))(prior_pad, y1)
        cols = jnp.arange(WIN)
        m = (cols[None, :, None] <
             L.reshape(-1)[:, None, None]).astype(jnp.float32)[:, None]
        lq_f = lq_win.reshape(B * S, H, WIN, C) * m
        prior_f = prior_win.reshape(B * S, H, WIN, C) * m
        adain = adaptive_instance_norm(prior_f, lq_f, prior_mask=m,
                                       lq_mask=m)
        xin_ref = jnp.concatenate([adain, lq_f], axis=-1)
        y_ref = swish(group_norm(xin_ref, gamma, beta, (2 * C) // 32,
                                 mask=m))

        y, xin = pallas_sft.adain_gn_windows(canvas, priors, x1, y1, L,
                                             gamma, beta, interpret=True)
        np.testing.assert_allclose(
            np.asarray(xin.reshape(B * S, H, WIN, 2 * C)),
            np.asarray(xin_ref), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(y.reshape(B * S, H, WIN, 2 * C)),
            np.asarray(y_ref), atol=2e-4)

    def test_gn_swish(self, rng):
        B, H, W, C = self.B, self.H, self.W, self.C
        x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        lengths = jnp.asarray([W, 7, 19], jnp.int32)
        gamma = jnp.asarray(rng.standard_normal(C), jnp.float32)
        beta = jnp.asarray(rng.standard_normal(C), jnp.float32)
        m = self._mask(lengths)
        ref = swish(group_norm(x * m, gamma, beta, C // 32, mask=m))
        out = pallas_sft.gn_swish(x, lengths, gamma, beta, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4)

    def test_writeback(self, rng):
        B, H, W, C = self.B, self.H, self.W, self.C
        S, WIDTH = 4, 96
        canvas = jnp.asarray(rng.standard_normal((B, H, WIDTH, C)),
                             jnp.float32)
        lqw = jnp.asarray(rng.standard_normal((B, S, H, W, C)), jnp.float32)
        sc = jnp.asarray(rng.standard_normal((B, S, H, W, C)), jnp.float32)
        sh = jnp.asarray(rng.standard_normal((B, S, H, W, C)), jnp.float32)
        x1 = jnp.asarray(rng.integers(0, WIDTH - 4, (B, S)), jnp.int32)
        L = jnp.minimum(
            jnp.asarray(rng.integers(1, W + 1, (B, S)), jnp.int32),
            WIDTH - x1)
        valid = jnp.asarray(rng.integers(0, 2, (B, S)), jnp.int32)
        valid = valid.at[:, 0].set(1)

        # sequential masked updates — the reference overlap semantics
        res = np.asarray(lqw * sc + sh)
        want = np.asarray(canvas).copy()
        for b in range(B):
            for s in range(S):
                if int(valid[b, s]) == 0:
                    continue
                xx, ll = int(x1[b, s]), int(L[b, s])
                want[b, :, xx:xx + ll, :] = (
                    np.asarray(canvas)[b, :, xx:xx + ll, :] +
                    res[b, s, :, :ll, :])

        out = pallas_sft.sft_writeback(canvas, lqw * sc + sh, x1, L,
                                       valid, interpret=True)
        np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


class TestFusedSFTModule:
    def test_sftfusion_fused_matches_xla(self, rng, force_interpret):
        from marconet_tpu.models.srnet import SFTFusion

        B, N, C, HW = 2, 4, 128, 8
        H, WIN, WIDTH = 16, 2 * HW, 128
        canvas = jnp.asarray(rng.standard_normal((B, H, WIDTH, C)) * .3,
                             jnp.float32)
        priors = jnp.asarray(rng.standard_normal((B, N, H, WIN, C)) * .3,
                             jnp.float32)
        locs = np.zeros((B, 2 * N), np.float32)
        # include edge-truncated windows on both sides
        locs[:, 0::2] = [0.01, 0.3, 0.62, 0.99]
        locs[:, 1::2] = 0.05
        locs = jnp.asarray(locs)
        mask = jnp.asarray([[1, 1, 1, 1], [1, 1, 0, 1]], jnp.float32)

        sft = SFTFusion(half_width=HW, features=C, dtype=jnp.float32)
        params = sft.init(jax.random.PRNGKey(0), canvas, priors, locs,
                          mask)

        assert pallas_sft.use_pallas_sft(False, C)
        fused = sft.apply(params, canvas, priors, locs, mask)

        pallas_sft.FORCE_INTERPRET = False
        assert not pallas_sft.use_pallas_sft(False, C)
        ref = sft.apply(params, canvas, priors, locs, mask)

        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   atol=5e-4)
