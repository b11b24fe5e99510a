"""Pallas SFT write-back kernel vs the XLA path (interpreter on CPU).

``ops/pallas_sft.sft_writeback`` is the opt-in alternative to the
default one-hot selection-matmul write-back in ``models/srnet.SFTFusion``
(see the module docstring for the measured rationale). These tests pin
the kernel — standalone against the reference's sequential overlap
semantics, and through the full ``SFTFusion`` module against the XLA
path that the CPU suite already validates against the torch oracles
(``tests/test_convert.py``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from marconet_tpu.ops import pallas_sft


@pytest.fixture
def force_interpret():
    pallas_sft.FORCE_INTERPRET = True
    yield
    pallas_sft.FORCE_INTERPRET = False


class TestWriteback:
    def test_writeback(self, rng):
        B, H, W, C = 3, 16, 32, 128
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


class TestSFTModulePath:
    def test_sftfusion_pallas_writeback_matches_xla(self, rng,
                                                    force_interpret):
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
