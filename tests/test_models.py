"""Model-level invariants: parameter counts (the parity gate vs the
reference's printed numbers) and I/O shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from marconet_tpu.models import (
    TextContextEncoder,
    StructurePriorGenerator,
    StructurePriorSRNet,
)
from marconet_tpu.models.pipeline import MARCONet


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


@pytest.fixture(scope="module")
def small_batch():
    rng = np.random.default_rng(0)
    lq = jnp.asarray(rng.standard_normal((1, 32, 512, 3), dtype=np.float32))
    return lq


class TestEncoder:
    @pytest.fixture(scope="class")
    def enc(self, small_batch):
        m = TextContextEncoder()
        # jitted init: one compiled (persistently cached) program instead
        # of hundreds of small eager dispatches — full-size inits dominate
        # these fixtures' wall time on the 1-core CI host
        return m, jax.jit(m.init)(jax.random.PRNGKey(0), small_batch)

    def test_param_count_matches_reference(self, enc):
        # reference prints 43.06 M (test_sr.py:59); exact: 43,060,096
        _, variables = enc
        total = n_params(variables["params"])
        assert abs(total / 1e6 - 43.06) < 0.01, total

    def test_output_shapes(self, enc, small_batch):
        m, variables = enc
        logits, locs, w = m.apply(variables, small_batch)
        assert logits.shape == (1, 64, 6736)
        assert locs.shape == (1, 32)
        assert w.shape == (1, 512)
        # locs are sigmoid outputs
        assert float(jnp.min(locs)) >= 0.0 and float(jnp.max(locs)) <= 1.0


class TestPriorGenerator:
    @pytest.fixture(scope="class")
    def gen(self):
        m = StructurePriorGenerator()
        styles = jnp.zeros((2, 512))
        labels = jnp.array([3, 77], jnp.int32)
        return m, jax.jit(m.init)(jax.random.PRNGKey(0), styles, labels)

    def test_param_count_matches_reference(self, gen):
        # reference prints 27.97 M (test_sr.py:60)
        _, variables = gen
        total = n_params(variables["params"])
        assert abs(total / 1e6 - 27.97) < 0.01, total

    def test_output_shapes(self, gen):
        m, variables = gen
        rng = np.random.default_rng(1)
        styles = jnp.asarray(rng.standard_normal((2, 512),
                                                 dtype=np.float32))
        labels = jnp.array([3, 77], jnp.int32)
        out = m.apply(variables, styles, labels)
        assert out.image.shape == (2, 128, 128, 3)
        assert out.feat64.shape == (2, 64, 64, 256)
        assert out.feat32.shape == (2, 32, 32, 512)
        assert out.rgb64.shape == (2, 64, 64, 3)
        assert out.rgb32.shape == (2, 32, 32, 3)
        # tanh range
        assert float(jnp.max(jnp.abs(out.image))) <= 1.0


class TestSRNet:
    @pytest.fixture(scope="class")
    def srn(self, small_batch):
        m = StructurePriorSRNet()
        rng = np.random.default_rng(2)
        p64 = jnp.asarray(rng.standard_normal((1, 16, 64, 64, 256),
                                              dtype=np.float32) * 0.1)
        p32 = jnp.asarray(rng.standard_normal((1, 16, 32, 32, 512),
                                              dtype=np.float32) * 0.1)
        locs = jnp.asarray(
            rng.uniform(0.05, 0.95, (1, 32)).astype(np.float32))
        variables = jax.jit(m.init)(jax.random.PRNGKey(0), small_batch,
                                    p64, p32, locs)
        return m, variables, p64, p32, locs

    def test_param_count_matches_reference(self, srn):
        # reference prints 16.87 M (test_sr.py:61)
        _, variables, *_ = srn
        total = n_params(variables["params"])
        assert abs(total / 1e6 - 16.87) < 0.01, total

    def test_output_shape_and_range(self, srn, small_batch):
        m, variables, p64, p32, locs = srn
        out = m.apply(variables, small_batch, p64, p32, locs)
        assert out.shape == (1, 128, 2048, 3)
        assert float(jnp.max(jnp.abs(out))) <= 1.0

    def test_masked_slots_do_not_affect_output(self, srn, small_batch):
        """Invalid char slots must have zero influence (static-slot
        design invariant)."""
        m, variables, p64, p32, locs = srn
        mask = jnp.array([[1.0] * 4 + [0.0] * 12])
        out1 = m.apply(variables, small_batch, p64, p32, locs, mask)
        # perturb the masked slots' priors and locs wildly
        p64b = p64.at[:, 4:].set(13.7)
        p32b = p32.at[:, 4:].set(-9.1)
        locsb = locs.at[:, 8:].set(0.5)
        out2 = m.apply(variables, small_batch, p64b, p32b, locsb, mask)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   atol=1e-5)


class TestPipeline:
    @pytest.fixture(scope="class")
    def full_net(self):
        """One shared full-size pipeline init (jitted → persistently
        cached) for the full-width TestPipeline cases."""
        net = MARCONet()
        params = jax.jit(net.init)(jax.random.PRNGKey(0))
        return net, params

    def test_restore_shapes(self, full_net):
        net, params = full_net
        rng = np.random.default_rng(3)
        lq = jnp.asarray(rng.uniform(-1, 1, (1, 32, 512, 3))
                         .astype(np.float32))
        labels = jnp.full((1, 16), 6735, jnp.int32)
        labels = labels.at[0, :3].set(jnp.array([5, 9, 200]))
        locs = jnp.zeros((1, 32), jnp.float32)
        locs = locs.at[0, :6].set(jnp.array([.1, .03, .2, .03, .3, .03]))
        mask = jnp.zeros((1, 16), jnp.float32).at[0, :3].set(1.0)
        out = net.restore(params, lq, labels, locs, mask)
        assert out.sr.shape == (1, 128, 2048, 3)
        assert out.priors.shape == (1, 16, 128, 128, 3)
        assert out.logits.shape == (1, 64, 6736)
        assert out.w.shape == (1, 512)

    @pytest.mark.slow
    @pytest.mark.skipif(not __import__("os").environ.get("RUN_SLOW"),
                        reason="two full-pipeline compiles; RUN_SLOW=1")
    def test_slot_bucketing_equivalent(self):
        """restore with N=8 slots == restore with 16 slots and the extra
        8 masked (the serve-path slot-bucketing invariant; float-noise
        tolerance — see the reduced test's note)."""
        net = MARCONet()
        params = net.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        lq = jnp.asarray(rng.uniform(-1, 1, (1, 32, 512, 3))
                         .astype(np.float32))
        lab8 = jnp.asarray(rng.integers(0, 6735, (1, 8)).astype(np.int32))
        locs8 = jnp.asarray(rng.uniform(0.05, 0.95, (1, 16))
                            .astype(np.float32))
        mask8 = jnp.ones((1, 8), jnp.float32)
        out8 = net.restore(params, lq, lab8, locs8, mask8)
        lab16 = jnp.concatenate(
            [lab8, jnp.full((1, 8), 6735, jnp.int32)], 1)
        locs16 = jnp.concatenate(
            [locs8, jnp.zeros((1, 16), jnp.float32)], 1)
        mask16 = jnp.concatenate([mask8, jnp.zeros((1, 8))], 1)
        out16 = net.restore(params, lq, lab16, locs16, mask16)
        np.testing.assert_allclose(np.asarray(out8.sr),
                                   np.asarray(out16.sr),
                                   rtol=0, atol=5e-5)

    def test_slot_bucketing_equivalent_reduced(self):
        """Same invariant as the RUN_SLOW full-size test, at reduced
        width (identical code path) so the serve-path bucketing claim is
        exercised on every default-suite run.

        Tolerance note: masked extra slots are semantically inert, and on
        a fixed single-device config the two runs are bit-identical; under
        the suite's 8-virtual-device CPU flag XLA partitions intra-op
        parallelism differently per program, reassociating reductions —
        so the assertion allows float-noise-level differences."""
        net = MARCONet(width=0.0625)
        params = jax.jit(net.init)(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        lq = jnp.asarray(rng.uniform(-1, 1, (1, 32, 512, 3))
                         .astype(np.float32))
        lab8 = jnp.asarray(rng.integers(0, 6735, (1, 8)).astype(np.int32))
        locs8 = jnp.asarray(rng.uniform(0.05, 0.95, (1, 16))
                            .astype(np.float32))
        mask8 = jnp.ones((1, 8), jnp.float32)
        out8 = net.restore(params, lq, lab8, locs8, mask8)
        lab16 = jnp.concatenate(
            [lab8, jnp.full((1, 8), 6735, jnp.int32)], 1)
        locs16 = jnp.concatenate(
            [locs8, jnp.zeros((1, 16), jnp.float32)], 1)
        mask16 = jnp.concatenate([mask8, jnp.zeros((1, 8))], 1)
        out16 = net.restore(params, lq, lab16, locs16, mask16)
        np.testing.assert_allclose(np.asarray(out8.sr),
                                   np.asarray(out16.sr),
                                   rtol=0, atol=5e-5)

    def test_interpolate_styles(self, full_net):
        net, params = full_net
        w1 = jnp.ones((512,)) * 0.1
        w2 = -jnp.ones((512,)) * 0.1
        labels = jnp.array([1, 2], jnp.int32)
        weights = jnp.linspace(0.0, 1.0, 3)
        imgs = net.interpolate_styles(params, w1, w2, labels, weights)
        assert imgs.shape == (3, 2, 128, 128, 3)


class TestPhaseTail:
    def test_phase_tail_equivalent(self):
        """The phase-separated final chain (default) must match the plain
        hi-res tail bit-for-tolerance with the SAME parameters — it is an
        exact layout re-bracketing, not an approximation."""
        rng = np.random.default_rng(5)
        lq = jnp.asarray(rng.standard_normal((1, 32, 128, 3)) * 0.3,
                         jnp.float32)
        p64 = jnp.asarray(rng.standard_normal((1, 2, 64, 64, 32)) * 0.1,
                          jnp.float32)
        p32 = jnp.asarray(rng.standard_normal((1, 2, 32, 32, 64)) * 0.1,
                          jnp.float32)
        locs = jnp.asarray([[0.3, 0.1, 0.7, 0.1]], jnp.float32)

        plain = StructurePriorSRNet(dim=32, phase_tail=False)
        phased = StructurePriorSRNet(dim=32, phase_tail=True)
        variables = jax.jit(plain.init)(jax.random.PRNGKey(0), lq, p64,
                                        p32, locs)
        # identical parameter trees: a converted checkpoint loads into
        # either graph (eval_shape: abstract trace, no compile/execute)
        variables2 = jax.eval_shape(phased.init, jax.random.PRNGKey(0),
                                    lq, p64, p32, locs)
        assert jax.tree_util.tree_structure(variables) == \
            jax.tree_util.tree_structure(variables2)
        ref = plain.apply(variables, lq, p64, p32, locs)
        got = phased.apply(variables, lq, p64, p32, locs)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4)

    def test_wfold_tail_equivalent(self):
        """The width-folded final chain must match the plain hi-res tail
        with the SAME parameters — exact layout re-bracketing
        (``ops/widthfold``), like the phase tail."""
        rng = np.random.default_rng(6)
        lq = jnp.asarray(rng.standard_normal((1, 32, 128, 3)) * 0.3,
                         jnp.float32)
        p64 = jnp.asarray(rng.standard_normal((1, 2, 64, 64, 32)) * 0.1,
                          jnp.float32)
        p32 = jnp.asarray(rng.standard_normal((1, 2, 32, 32, 64)) * 0.1,
                          jnp.float32)
        locs = jnp.asarray([[0.3, 0.1, 0.7, 0.1]], jnp.float32)

        plain = StructurePriorSRNet(dim=32, tail_form="plain")
        folded = StructurePriorSRNet(dim=32, tail_form="wfold")
        variables = jax.jit(plain.init)(jax.random.PRNGKey(0), lq, p64,
                                        p32, locs)
        variables2 = jax.eval_shape(folded.init, jax.random.PRNGKey(0),
                                    lq, p64, p32, locs)
        assert jax.tree_util.tree_structure(variables) == \
            jax.tree_util.tree_structure(variables2)
        ref = plain.apply(variables, lq, p64, p32, locs)
        got = folded.apply(variables, lq, p64, p32, locs)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4)


class TestSFTPair:
    def test_paired_scale_shift_equivalent(self, monkeypatch):
        """The paired scale/shift formulation (one 2F-wide conv over
        `fuse`, then per-half conv2) is an exact re-bracketing of the two
        separate SNStacks — same parameter tree, same numerics."""
        from marconet_tpu.models.srnet import SFTFusion

        rng = np.random.default_rng(7)
        b, n, h, hw, c = 1, 2, 8, 8, 16
        canvas = jnp.asarray(rng.standard_normal((b, h, 8 * hw, c)) * 0.3,
                             jnp.float32)
        priors = jnp.asarray(
            rng.standard_normal((b, n, h, 2 * hw, c)) * 0.2, jnp.float32)
        locs = jnp.asarray([[0.3, 0.1, 0.9, 0.1]], jnp.float32)
        mask = jnp.ones((b, n), jnp.float32)

        mod = SFTFusion(half_width=hw, features=c)
        monkeypatch.setenv("MARCONET_SFT_PAIR", "0")
        variables = mod.init(jax.random.PRNGKey(1), canvas, priors, locs,
                             mask)
        ref = mod.apply(variables, canvas, priors, locs, mask)

        monkeypatch.setenv("MARCONET_SFT_PAIR", "1")
        variables2 = mod.init(jax.random.PRNGKey(1), canvas, priors, locs,
                              mask)
        assert jax.tree_util.tree_structure(variables) == \
            jax.tree_util.tree_structure(variables2)
        got = mod.apply(variables, canvas, priors, locs, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)


class TestSFTFold:
    def test_folded_adain_gn_equivalent(self, monkeypatch):
        """The folded formulation (AdaIN + the fuse block's norm1
        collapsed into one per-channel affine, conv_out re-bracketed
        into per-sample matmuls) must match the plain path on the same
        parameter tree — including truncated edge windows, masked-out
        slots and a fully out-of-range slot."""
        from marconet_tpu.models.srnet import SFTFusion

        rng = np.random.default_rng(11)
        b, n, h, hw, c = 2, 3, 8, 8, 16
        canvas = jnp.asarray(rng.standard_normal((b, h, 8 * hw, c)) * 0.3,
                             jnp.float32)
        priors = jnp.asarray(
            rng.standard_normal((b, n, h, 2 * hw, c)) * 0.2, jnp.float32)
        # slot 0 interior, slot 1 truncated at the right edge, slot 2
        # masked off
        locs = jnp.asarray([[0.3, 0.1, 0.97, 0.1, 0.5, 0.1],
                            [0.02, 0.1, 0.6, 0.1, 0.5, 0.1]], jnp.float32)
        mask = jnp.asarray([[1.0, 1.0, 0.0], [1.0, 1.0, 0.0]], jnp.float32)

        mod = SFTFusion(half_width=hw, features=c)
        monkeypatch.setenv("MARCONET_SFT_FOLD", "0")
        variables = mod.init(jax.random.PRNGKey(1), canvas, priors, locs,
                             mask)
        ref = mod.apply(variables, canvas, priors, locs, mask)

        monkeypatch.setenv("MARCONET_SFT_FOLD", "1")
        variables2 = mod.init(jax.random.PRNGKey(1), canvas, priors, locs,
                              mask)
        assert jax.tree_util.tree_structure(variables) == \
            jax.tree_util.tree_structure(variables2)
        got = mod.apply(variables, canvas, priors, locs, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4)

    def test_padfree_gather_equivalent(self, monkeypatch):
        """The pad-free gather (clamped starts + rebased column mask /
        prior crop / selection) must match the padded layout exactly —
        including right-edge windows where the clamp offset is nonzero,
        left-edge truncation, overlap (later slot wins) and masked
        slots."""
        from marconet_tpu.models.srnet import SFTFusion

        rng = np.random.default_rng(7)
        b, n, h, hw, c = 2, 4, 8, 8, 16
        canvas = jnp.asarray(rng.standard_normal((b, h, 8 * hw, c)) * 0.3,
                             jnp.float32)
        priors = jnp.asarray(
            rng.standard_normal((b, n, h, 2 * hw, c)) * 0.2, jnp.float32)
        # slot 0 left-truncated, slot 1 interior, slot 2 right-edge
        # (clamped start, off > 0), slot 3 masked off; second sample
        # adds an overlapping pair
        locs = jnp.asarray(
            [[0.02, 0.1, 0.5, 0.1, 0.97, 0.1, 0.4, 0.1],
             [0.30, 0.1, 0.35, 0.1, 0.99, 0.1, 0.6, 0.1]], jnp.float32)
        mask = jnp.asarray([[1.0, 1.0, 1.0, 0.0],
                            [1.0, 1.0, 1.0, 0.0]], jnp.float32)

        mod = SFTFusion(half_width=hw, features=c)
        monkeypatch.setenv("MARCONET_SFT_GATHER", "padded")
        variables = mod.init(jax.random.PRNGKey(1), canvas, priors, locs,
                             mask)
        ref = mod.apply(variables, canvas, priors, locs, mask)
        monkeypatch.setenv("MARCONET_SFT_GATHER", "padfree")
        # the padded-prior dynamic-slice crop inside padfree (explicit:
        # the default is now 'shiftmm', keep 'gather' covered)
        monkeypatch.setenv("MARCONET_SFT_PRIOR", "gather")
        got = mod.apply(variables, canvas, priors, locs, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6)
        # the shift-matmul prior crop inside padfree (the TPU default)
        monkeypatch.setenv("MARCONET_SFT_PRIOR", "shiftmm")
        got_mm = mod.apply(variables, canvas, priors, locs, mask)
        np.testing.assert_allclose(np.asarray(got_mm), np.asarray(ref),
                                   atol=1e-6)
        monkeypatch.delenv("MARCONET_SFT_PRIOR")
        # and under the folded-moments formulation
        monkeypatch.setenv("MARCONET_SFT_FOLD", "1")
        monkeypatch.setenv("MARCONET_SFT_GATHER", "padded")
        ref2 = mod.apply(variables, canvas, priors, locs, mask)
        monkeypatch.setenv("MARCONET_SFT_GATHER", "padfree")
        got2 = mod.apply(variables, canvas, priors, locs, mask)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                                   atol=1e-6)

    def test_writeback_direct_equivalent(self, monkeypatch):
        """The direct (no pre-transpose) write-back einsum must be
        bit-compatible with the flattened form."""
        from marconet_tpu.models.srnet import SFTFusion

        rng = np.random.default_rng(3)
        b, n, h, hw, c = 1, 2, 8, 8, 16
        canvas = jnp.asarray(rng.standard_normal((b, h, 8 * hw, c)) * 0.3,
                             jnp.float32)
        priors = jnp.asarray(
            rng.standard_normal((b, n, h, 2 * hw, c)) * 0.2, jnp.float32)
        # overlapping windows: later slot must win where both cover
        locs = jnp.asarray([[0.3, 0.1, 0.35, 0.1]], jnp.float32)
        mask = jnp.ones((b, n), jnp.float32)

        mod = SFTFusion(half_width=hw, features=c)
        variables = mod.init(jax.random.PRNGKey(1), canvas, priors, locs,
                             mask)
        monkeypatch.setenv("MARCONET_SFT_WB", "flat")
        ref = mod.apply(variables, canvas, priors, locs, mask)
        monkeypatch.setenv("MARCONET_SFT_WB", "direct")
        got = mod.apply(variables, canvas, priors, locs, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6)
        # the row-gather (take_along_axis) formulation — the selection
        # must behave identically incl. last-writer-wins overlap
        monkeypatch.setenv("MARCONET_SFT_WB", "take")
        got_t = mod.apply(variables, canvas, priors, locs, mask)
        np.testing.assert_allclose(np.asarray(got_t), np.asarray(ref),
                                   atol=1e-6)
