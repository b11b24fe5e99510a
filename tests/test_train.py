"""Training stack tests: loss numerics vs torch, batch prep, and a full
jitted GAN train step on an 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from marconet_tpu.alphabet import BLANK_INDEX
from marconet_tpu.data.batch_prep import prepare_train_batch
from marconet_tpu.train import losses as L
from marconet_tpu.train.discriminators import UNetDiscriminatorSN
from marconet_tpu.train.train_step import (
    MARCONetTrainer,
    TrainBatch,
    TrainConfig,
    crop_chars,
)


class TestLosses:
    def test_ctc_matches_torch(self, rng):
        B, T, C = 2, 12, 20
        blank = C - 1
        logits = rng.standard_normal((B, T, C)).astype(np.float32)
        labels = np.full((B, 6), blank, np.int64)
        labels[0, :3] = [1, 5, 2]
        labels[1, :4] = [7, 7, 3, 9]

        got = float(L.ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                               blank=blank))
        logp = F.log_softmax(torch.from_numpy(logits), dim=2).permute(1, 0, 2)
        tgt = torch.tensor([1, 5, 2, 7, 7, 3, 9])
        want = torch.nn.CTCLoss(blank=blank)(
            logp, tgt, torch.tensor([T, T]), torch.tensor([3, 4]))
        np.testing.assert_allclose(got, float(want), rtol=1e-4)

    def test_smooth_l1_matches_torch(self, rng):
        a = rng.standard_normal((4, 7)).astype(np.float32) * 3
        b = rng.standard_normal((4, 7)).astype(np.float32) * 3
        got = float(L.smooth_l1_loss(jnp.asarray(a), jnp.asarray(b)))
        want = torch.nn.SmoothL1Loss()(torch.from_numpy(a),
                                       torch.from_numpy(b))
        np.testing.assert_allclose(got, float(want), rtol=1e-5)

    def test_text_ce_matches_torch(self, rng):
        B, T, C = 2, 5, 10
        logits = rng.standard_normal((B, T, C)).astype(np.float32)
        labels = rng.integers(0, C, (B, T))
        got = float(L.text_ce_loss(jnp.asarray(logits), jnp.asarray(labels),
                                   num_classes=C))
        w = torch.ones(C)
        w[-1] = 0.1
        want = F.cross_entropy(torch.from_numpy(logits).transpose(1, 2),
                               torch.from_numpy(labels).long(), w)
        np.testing.assert_allclose(got, float(want), rtol=1e-5)

    def test_hinge_losses(self, rng):
        f = rng.standard_normal((3, 5)).astype(np.float32)
        r = rng.standard_normal((3, 5)).astype(np.float32)
        np.testing.assert_allclose(
            float(L.hinge_g_loss(jnp.asarray(f))), -f.mean(), rtol=1e-6)
        want = np.maximum(1 - r, 0).mean() + np.maximum(1 + f, 0).mean()
        np.testing.assert_allclose(
            float(L.hinge_d_loss(jnp.asarray(r), jnp.asarray(f))), want,
            rtol=1e-6)

    def test_box_iou_loss_range(self, rng):
        pred = np.array([[0.5, 0.05, 0.2, 0.04]], np.float32)
        gt = np.array([[0.5, 0.05, 0.8, 0.04]], np.float32)
        valid = np.array([[1.0, 1.0]], np.float32)
        loss = float(L.box_iou_loss(jnp.asarray(pred), jnp.asarray(gt),
                                    jnp.asarray(valid)))
        # first box perfect (IoU 1), second disjoint (IoU 0) -> mean 0.5
        np.testing.assert_allclose(loss, 0.5, atol=1e-5)

    def test_lr_to_center_width(self):
        lr = jnp.asarray([[0.1, 0.3, 0.5, 0.9]])
        cw = np.asarray(L.lr_to_center_width(lr))
        np.testing.assert_allclose(cw, [[0.2, 0.1, 0.7, 0.2]], atol=1e-6)


class TestDiscriminator:
    def test_shapes(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 128, 128, 3),
                                            dtype=np.float32))
        m = UNetDiscriminatorSN()
        variables = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(variables, x)
        assert out.shape == (2, 128, 128, 1)
        # 6-channel variant
        x6 = jnp.concatenate([x, x], -1)
        m6 = UNetDiscriminatorSN()
        v6 = m6.init(jax.random.PRNGKey(1), x6)
        assert m6.apply(v6, x6).shape == (2, 128, 128, 1)


class TestCropChars:
    def test_interior_crop_is_exact(self, rng):
        img = jnp.asarray(rng.standard_normal((1, 8, 2048, 3),
                                              dtype=np.float32))
        from marconet_tpu.data.batch_prep import _crop_taps

        idx, w0 = _crop_taps(500)
        out = crop_chars(img, jnp.asarray(idx)[None, None],
                         jnp.asarray(w0)[None, None])
        np.testing.assert_allclose(np.asarray(out[0, 0]),
                                   np.asarray(img[0, :, 436:564]), atol=1e-6)

    def test_edge_crop_matches_torch_resize(self, rng):
        img = rng.standard_normal((1, 8, 2048, 3)).astype(np.float32)
        from marconet_tpu.data.batch_prep import _crop_taps

        center = 30  # x1=0, x2=94 -> resize 94 -> 128
        idx, w0 = _crop_taps(center)
        out = crop_chars(jnp.asarray(img), jnp.asarray(idx)[None, None],
                         jnp.asarray(w0)[None, None])
        crop = torch.from_numpy(img[:, :, 0:94]).permute(0, 3, 1, 2)
        want = F.interpolate(crop, (8, 128), mode="bilinear")
        want = want.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(out[0, 0]), want[0],
                                   rtol=1e-4, atol=1e-5)


from tests.train_fixtures import tiny_batch  # noqa: E402  (shared with
# the multi-process subprocess workers, tests/mp_worker.py)


class TestBatchPrep:
    def test_masks_and_shapes(self, rng):
        d = tiny_batch(rng)
        assert d["char_valid"].sum() == 6
        assert d["gt_chars"].shape == (2, 16, 128, 128, 3)
        assert d["patch_valid"].sum() > 0
        # glyph canvases of valid slots contain ink (+1) pixels
        assert d["gt_chars"][0, 0].max() == 1.0
        # invalid slots stay at -1
        assert d["gt_chars"][0, 5].max() == -1.0


class TestTrainStepReduced:
    """Full 3-phase GAN step + 8-device mesh, at reduced width + slots.

    Same code path as the full-size step (``MARCONetTrainer(width=...,
    max_chars=...)`` scales channel plans and slot capacity only), small
    enough to compile in the default suite — the risk paths (5-net
    graph, mesh sharding, spectral-state plumbing, optimizer updates)
    are exercised on every ``pytest -q``.
    """

    WIDTH = 0.0625
    SLOTS = 4

    def test_step_on_8_device_mesh_reduced(self, rng):
        from marconet_tpu.parallel import make_mesh, shard_batch
        from marconet_tpu.parallel.mesh import replicate_tree

        mesh = make_mesh(8)
        trainer = MARCONetTrainer(TrainConfig(), width=self.WIDTH,
                                  max_chars=self.SLOTS)
        state = trainer.init_state(jax.random.PRNGKey(0))
        old = {name: np.asarray(
            jax.tree.leaves(getattr(state, name)["params"])[0])
            for name in ("encoder", "prior", "srnet", "net_d", "net_srd")}
        state = replicate_tree(mesh, state)
        batch = TrainBatch(**{
            k: jnp.asarray(v)
            for k, v in tiny_batch(rng, b=8, n_chars=self.SLOTS).items()})
        batch = TrainBatch(*shard_batch(mesh, tuple(batch)))
        step = jax.jit(trainer.train_step, donate_argnums=0)
        new_state, metrics = step(state, batch)
        for k, v in metrics.items():
            assert np.isfinite(float(v)), f"{k} not finite"
        assert int(new_state.step) == 1
        for name, before in old.items():
            after = jax.tree.leaves(getattr(new_state, name)["params"])[0]
            assert not np.allclose(before, np.asarray(after)), name

    def test_freeze_groups_mask_updates(self, rng):
        """Selective freezing (reference stop_update_* toggles): frozen
        parameter groups receive zero optimizer updates; everything else
        still trains. Single-device, batch 2, reduced width."""
        cfg = TrainConfig(freeze=("encoder.cls", "prior"))
        trainer = MARCONetTrainer(cfg, width=self.WIDTH,
                                  max_chars=self.SLOTS)
        state = trainer.init_state(jax.random.PRNGKey(0))

        def snap(tree):
            return jax.tree_util.tree_map_with_path(
                lambda p, x: (tuple(str(getattr(k, "key", k)) for k in p),
                              np.asarray(x)), tree)

        enc_before = jax.tree_util.tree_flatten_with_path(
            state.encoder["params"])[0]
        pri_before = jax.tree.leaves(state.prior["params"])
        batch = TrainBatch(**{
            k: jnp.asarray(v)
            for k, v in tiny_batch(rng, b=2, n_chars=self.SLOTS).items()})
        step = jax.jit(trainer.train_step)
        new_state, _ = step(state, batch)

        enc_after = jax.tree_util.tree_flatten_with_path(
            new_state.encoder["params"])[0]
        changed_frozen = changed_rest = 0
        for (path, before), (_, after) in zip(enc_before, enc_after):
            p = "/".join(str(getattr(k, "key", k)) for k in path)
            frozen = any(p.startswith(pre) for pre in (
                "vit/branch_cls", "vit/head_cls_norm", "vit/head_cls_proj"))
            same = np.array_equal(np.asarray(before), np.asarray(after))
            if frozen:
                assert same, f"frozen param {p} changed"
            elif not same:
                changed_rest += 1
        assert changed_rest > 0, "unfrozen encoder params did not train"
        for before, after in zip(pri_before,
                                 jax.tree.leaves(new_state.prior["params"])):
            assert np.array_equal(np.asarray(before), np.asarray(after))

    def test_freeze_unknown_group_raises(self):
        with pytest.raises(ValueError, match="unknown freeze group"):
            MARCONetTrainer(TrainConfig(freeze=("encoder.nope",)),
                            width=self.WIDTH, max_chars=self.SLOTS)

    def test_visual_forward_shapes(self, rng):
        trainer = MARCONetTrainer(TrainConfig(), width=self.WIDTH,
                                  max_chars=self.SLOTS)
        state = trainer.init_state(jax.random.PRNGKey(0))
        batch = TrainBatch(**{
            k: jnp.asarray(v)
            for k, v in tiny_batch(rng, b=2, n_chars=self.SLOTS).items()})
        vis = jax.jit(trainer.visual_forward)(state, batch)
        n = self.SLOTS
        assert vis["sr"].shape == (2, 128, 128 * n, 3)
        assert vis["prior128"].shape == (2, n, 128, 128, 3)
        assert vis["pred_cw"].shape == (2, 2 * n)
        assert vis["pred_ids"].shape == (2, 4 * n)


class TestVisualGrids:
    def test_build_visual_grids(self, rng):
        from marconet_tpu.train.visuals import (build_visual_grids,
                                                ctc_collapse_ids)

        b = 2
        gt = rng.uniform(-1, 1, (b, 128, 2048, 3)).astype(np.float32)
        lq = rng.uniform(-1, 1, (b, 32, 512, 3)).astype(np.float32)
        sr = rng.uniform(-1, 1, (b, 128, 2048, 3)).astype(np.float32)
        pri = rng.uniform(-1, 1, (b, 16, 128, 128, 3)).astype(np.float32)
        gtc = rng.uniform(-1, 1, (b, 16, 128, 128, 3)).astype(np.float32)
        cw = np.tile(np.array([0.1, 0.03] * 16, np.float32), (b, 1))
        lr = np.tile(np.array([0.07, 0.13] * 16, np.float32), (b, 1))
        ids = np.full((b, 64), 6735, np.int64)
        ids[:, :3] = [[4, 4, 9]] * b
        grids = build_visual_grids(gt, lq, sr, pri, gtc, cw, lr, ids)
        assert set(grids) == {"1_gt_sr_lq", "2_pred_locs", "1_pred_text",
                              "3_char_gt", "3_char_prior"}
        for img in grids.values():
            assert img.dtype == np.uint8 and img.ndim == 3
        # CTC collapse drops the repeat and the blanks
        assert len(ctc_collapse_ids(ids[0])) == 2


class TestMakeMesh:
    def test_multi_axis_requires_shape(self):
        from marconet_tpu.parallel import make_mesh

        with pytest.raises(ValueError):
            make_mesh(8, axes=("dcn", "data"))
        mesh = make_mesh(8, axes=("dcn", "data"), shape=(2, 4))
        assert mesh.devices.shape == (2, 4)
        assert mesh.axis_names == ("dcn", "data")
        with pytest.raises(ValueError):
            make_mesh(8, axes=("dcn", "data"), shape=(3, 3))

    def test_dp_over_dcn_axis_step(self, rng):
        """Batch sharded over BOTH mesh axes (2 slices x 4 chips) runs the
        jitted step — the multi-slice scale-out layout."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from marconet_tpu.parallel import make_mesh

        mesh = make_mesh(8, axes=("dcn", "data"), shape=(2, 4))
        sh = NamedSharding(mesh, P(("dcn", "data")))

        @jax.jit
        def mean_grad(x):
            return jax.grad(lambda y: (y ** 2).sum())(x).mean()

        x = jax.device_put(
            jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32)),
            sh)
        assert np.isfinite(float(mean_grad(x)))


# The full-size step tests compile the entire 5-net GAN graph — tens of
# minutes of XLA:CPU compile time on this host — so they are opt-in
# (RUN_SLOW=1); TestTrainStepReduced covers the same code path in the
# default suite and the driver's dryrun_multichip runs it every round.
@pytest.mark.slow
@pytest.mark.skipif(not __import__("os").environ.get("RUN_SLOW"),
                    reason="set RUN_SLOW=1 to run full train-step tests")
class TestTrainStep:
    def test_one_step_updates_and_is_finite(self, rng):
        trainer = MARCONetTrainer(TrainConfig())
        state = trainer.init_state(jax.random.PRNGKey(0))
        old_leaves = {
            name: np.asarray(
                jax.tree.leaves(getattr(state, name)["params"])[0])
            for name in ("encoder", "prior", "srnet", "net_d", "net_srd")}
        batch = TrainBatch(**{k: jnp.asarray(v)
                              for k, v in tiny_batch(rng).items()})
        step = jax.jit(trainer.train_step, donate_argnums=0)
        new_state, metrics = step(state, batch)
        for k, v in metrics.items():
            assert np.isfinite(float(v)), f"{k} not finite"
        assert int(new_state.step) == 1
        # every net changed
        for name, old in old_leaves.items():
            new = jax.tree.leaves(getattr(new_state, name)["params"])[0]
            assert not np.allclose(old, np.asarray(new))

    def test_step_on_8_device_mesh(self, rng):
        from marconet_tpu.parallel import make_mesh, shard_batch
        from marconet_tpu.parallel.mesh import replicate_tree

        mesh = make_mesh(8)
        trainer = MARCONetTrainer(TrainConfig())
        state = trainer.init_state(jax.random.PRNGKey(0))
        state = replicate_tree(mesh, state)
        batch = TrainBatch(**{k: jnp.asarray(v)
                              for k, v in tiny_batch(rng, b=8).items()})
        batch = TrainBatch(*shard_batch(mesh, tuple(batch)))
        step = jax.jit(trainer.train_step, donate_argnums=0)
        _, metrics = step(state, batch)
        assert np.isfinite(float(metrics["l_g_total"]))
