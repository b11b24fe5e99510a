"""Full GAN training step (G+encoder+SR / D / SRD), TPU-native.

Re-design of the reference's ``TSPGANModel.optimize_parameters``
(``Train/tspgan/models/tspgan_model.py:317-607``) as one jit-compiled,
static-shape program:

* the B x 16 python loc/IoU loops -> masked batched losses
  (``marconet_tpu.train.losses``);
* the per-sample prior-generation loop -> one (B*16)-slot generator batch;
* the variable-count char/patch crops -> fixed 16-slot crops driven by
  host-precomputed 2-tap resample indices (crop geometry depends only on
  ``boxinfo``, so it belongs in the input pipeline — see
  ``marconet_tpu.data.batch_prep``);
* the three ``optimizer.step()`` phases -> three functional optax updates
  inside a single jitted step; gradient cross-replica reduction is
  inserted by the SPMD partitioner from the batch sharding (the XLA
  equivalent of the reference's DDP/NCCL all-reduce).

Reference semantics preserved: priors and locs are stop-gradiented on
entry to the SR net (the train archs detach them,
``Train/tspgan/archs/tsp_arch.py:202-205,246-249``); the encoder's locs
head predicts (left, right) pairs which are converted to (center,
half-width) before the SR net (``tspgan_model.py:333-337``); loss lambdas
follow ``Train/options/train.yml:106-162``.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from marconet_tpu.alphabet import BLANK_INDEX
from marconet_tpu.models.encoder import MAX_CHARS, TextContextEncoder
from marconet_tpu.models.prior import StructurePriorGenerator
from marconet_tpu.models.srnet import StructurePriorSRNet
from marconet_tpu.train import losses as L
from marconet_tpu.train.discriminators import UNetDiscriminatorSN
from marconet_tpu.train.lpips import LPIPS


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------


class TrainConfig(NamedTuple):
    """Loss lambdas + optimizer hyperparameters (train.yml defaults)."""

    lr_g: float = 1e-5
    lr_d: float = 1e-4
    lr_encoder: float = 2e-5
    lr_sr: float = 5e-5
    lr_srd: float = 5e-5
    # StyleGAN-style lr/beta scaling (tspgan_model.py:128-203); no actual
    # R1/path regularization pass exists in the reference.
    g_reg_every: int = 4
    d_reg_every: int = 16
    milestones: Tuple[int, ...] = (600_000, 700_000)
    lr_gamma: float = 0.5
    # loss lambdas
    pixel_weight: float = 10.0        # L1Loss loss_weight
    lambda128: float = 2.0
    lambda64: float = 1.0
    lambda32: float = 1.0
    lambda_pix_iou: float = 5.0
    ctc_lambda: float = 1.0
    loc_lambda: float = 0.1
    iou_lambda: float = 1.0
    gan_lambda: float = 0.02
    srgan_lambda: float = 0.02
    lpips_lambda: float = 1.0
    srpixel_weight: float = 10.0
    # architecture width multiplier (1.0 = exact reference channel plans;
    # reduced widths share the identical code path — dryrun/CI tiers)
    width: float = 1.0
    # character-slot capacity (16 = exact reference; the GT canvas is
    # max_chars*128 wide). Reduced counts share the identical code path.
    max_chars: int = MAX_CHARS
    # selective freezing — the reference's module-level stop_update_*
    # toggles (``Train/tspgan/archs/textvit_arch.py:6-10,100-134``,
    # ``tsp_arch.py:292-294``), expressed as config: parameter groups
    # whose optimizer updates are masked to zero. See _FREEZE_GROUPS.
    freeze: Tuple[str, ...] = ()


class TrainBatch(NamedTuple):
    """One device batch (host-prepared; see ``data.batch_prep``)."""

    lq: jax.Array             # (B, 32, 512, 3) in [-1, 1]
    gt: jax.Array             # (B, 128, 2048, 3) in [-1, 1]
    labels: jax.Array         # (B, 16) int32, blank-padded
    boxinfo_lr: jax.Array     # (B, 32) normalized (left, right) pairs
    char_valid: jax.Array     # (B, 16) 1.0 where width>0 and label!=blank
    box_valid: jax.Array      # (B, 16) 1.0 where width>0 (IoU loss mask)
    gt_chars: jax.Array       # (B, 16, 128, 128, 3) centered ink crops
    crop_idx: jax.Array       # (B, 16, 128) int32 2-tap resample index
    crop_w0: jax.Array        # (B, 16, 128) f32 2-tap weight
    patch_valid: jax.Array    # (B, 16) 128px-patch validity


class TrainState(NamedTuple):
    step: jax.Array
    encoder: Dict[str, Any]
    prior: Dict[str, Any]
    srnet: Dict[str, Any]
    net_d: Dict[str, Any]
    net_srd: Dict[str, Any]
    opt: Dict[str, Any]       # optax states keyed by net name


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def crop_chars(img, crop_idx, crop_w0):
    """Fixed-shape char crops with bilinear x-resampling.

    img: (B, H, W, C); crop_idx/crop_w0: (B, N, 128).
    Returns (B, N, H, 128, C); equals the reference's center +-64 crop with
    resize-to-128 at truncated edges (``tspgan_model.py:524-546``).

    ``resample2tap`` carries a custom VJP: the backward scatter-add runs
    as a one-hot matmul over the image width instead of an XLA scatter
    (``ops/window.py``).
    """
    from marconet_tpu.ops.window import resample2tap

    return resample2tap(img, crop_idx, crop_w0)


def _resize_chars(chars, size):
    """(B, N, 128, 128, C) -> (B, N, size, size, C) bilinear."""
    b, n, h, w, c = chars.shape
    flat = chars.reshape(b * n, h, w, c)
    out = jax.image.resize(flat, (b * n, size, size, c), method="bilinear")
    return out.reshape(b, n, size, size, c)


def _adam(lr: float, ratio: float, milestones, gamma):
    sched = optax.piecewise_constant_schedule(
        lr * ratio, {int(m): gamma for m in milestones})
    return optax.adam(sched, b1=0.0, b2=0.99 ** ratio, eps=1e-8)


# Freeze-group name -> (net, frozen param-path prefixes). Mirrors the
# reference's module-level stop_update_* switches (all default-off there
# too): stop_update_resnet (tsp_arch.py:292-294), stop_update_backbone /
# _cls / _locs / _w / to_patch_embedding (textvit_arch.py:6-10,100-134,
# 205-223). An empty prefix freezes the whole net.
_FREEZE_GROUPS = {
    "encoder.resnet": ("encoder", ("resnet",)),
    "encoder.patch_embed": ("encoder", ("vit/patch_embed",)),
    "encoder.backbone": ("encoder", ("vit/shared_0", "vit/shared_1")),
    "encoder.cls": ("encoder", ("vit/branch_cls", "vit/head_cls_norm",
                                "vit/head_cls_proj")),
    "encoder.locs": ("encoder", ("vit/seq_to_maxlen", "vit/branch_locs",
                                 "vit/head_locs_norm", "vit/head_locs_fc1",
                                 "vit/head_locs_fc2")),
    "encoder.w": ("encoder", ("vit/branch_w", "vit/w_seq_pool",
                              "vit/head_w_norm", "vit/head_w_proj")),
    "encoder": ("encoder", ("",)),
    "prior": ("prior", ("",)),
    "srnet": ("srnet", ("",)),
    "net_d": ("net_d", ("",)),
    "net_srd": ("net_srd", ("",)),
}


def _freeze_prefixes(freeze) -> Dict[str, Tuple[str, ...]]:
    """Net name -> frozen param-path prefixes, validated."""
    out: Dict[str, Tuple[str, ...]] = {}
    for name in freeze or ():
        if name not in _FREEZE_GROUPS:
            raise ValueError(
                f"unknown freeze group {name!r}; valid: "
                f"{sorted(_FREEZE_GROUPS)}")
        net, prefixes = _FREEZE_GROUPS[name]
        out[net] = out.get(net, ()) + prefixes
    return out


def _masked_for_freeze(tx, prefixes: Tuple[str, ...]):
    """Wrap an optax transform to zero updates under frozen prefixes.

    ``optax.multi_transform`` (not ``optax.masked`` — masked passes the
    raw gradient through untouched for out-of-mask leaves).
    """
    if not prefixes:
        return tx

    def labels(params):
        def leaf_label(path, _):
            p = "/".join(str(getattr(k, "key", k)) for k in path)
            frozen = any(p.startswith(pre) or pre == ""
                         for pre in prefixes)
            return "frozen" if frozen else "train"
        return jax.tree_util.tree_map_with_path(leaf_label, params)

    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, labels)


# ---------------------------------------------------------------------------
# trainer
# ---------------------------------------------------------------------------


class MARCONetTrainer:
    """Builds the nets + optimizers and exposes a jittable train step."""

    def __init__(self, config: TrainConfig = TrainConfig(),
                 dtype=jnp.float32, num_classes: int = BLANK_INDEX + 1,
                 lpips_variables: Optional[Dict[str, Any]] = None,
                 width: Optional[float] = None,
                 max_chars: Optional[int] = None):
        """``width`` scales every net's channel plan (1.0 = the exact
        reference architecture; defaults to ``config.width``) and
        ``max_chars`` the character-slot capacity (16 = exact; the GT
        canvas is ``max_chars * 128`` wide, the LQ input a quarter of
        that). Reduced tiers run the identical code path with fewer
        channels/slots — used by the multi-chip CPU dryrun and the fast
        CI tier, where full-size XLA:CPU compiles are infeasible.
        """
        self.cfg = config
        self.dtype = dtype
        width = config.width if width is None else width
        self.width = width
        max_chars = config.max_chars if max_chars is None else max_chars
        self.max_chars = max_chars
        self.encoder = TextContextEncoder(num_classes=num_classes,
                                          width=width, dtype=dtype,
                                          max_length=max_chars)
        self.prior = StructurePriorGenerator(num_classes=num_classes,
                                             style_dim=self.encoder.w_dim,
                                             width=width, dtype=dtype)
        self.srnet = StructurePriorSRNet(dim=self.prior.channels[64],
                                         dtype=dtype, update_stats=True)
        self._disc_feat = max(8, int(round(64 * width)))
        self.net_d = self._make_disc(update_stats=True)
        self.net_srd = self._make_disc(update_stats=True)
        self.lpips = LPIPS(width=width, dtype=dtype)
        self.lpips_variables = lpips_variables

        c = config
        g_ratio = c.g_reg_every / (c.g_reg_every + 1)
        d_ratio = c.d_reg_every / (c.d_reg_every + 1)
        frozen = _freeze_prefixes(c.freeze)
        self.tx = {
            "encoder": _adam(c.lr_encoder, g_ratio, c.milestones, c.lr_gamma),
            "prior": _adam(c.lr_g, g_ratio, c.milestones, c.lr_gamma),
            "srnet": _adam(c.lr_sr, g_ratio, c.milestones, c.lr_gamma),
            "net_d": _adam(c.lr_d, d_ratio, c.milestones, c.lr_gamma),
            "net_srd": _adam(c.lr_srd, d_ratio, c.milestones, c.lr_gamma),
        }
        self.tx = {name: _masked_for_freeze(tx, frozen.get(name, ()))
                   for name, tx in self.tx.items()}

    def _make_disc(self, update_stats: bool) -> UNetDiscriminatorSN:
        return UNetDiscriminatorSN(num_feat=self._disc_feat,
                                   dtype=self.dtype,
                                   update_stats=update_stats)

    # -- init --------------------------------------------------------------

    def init_state(self, key, lpips_key=None) -> TrainState:
        k = jax.random.split(key, 6)
        ch = self.prior.channels
        n = self.max_chars
        lq = jnp.zeros((1, 32, 32 * n, 3), self.dtype)
        enc = self.encoder.init(k[0], lq)
        pri = self.prior.init(
            k[1], jnp.zeros((1, self.encoder.w_dim), self.dtype),
            jnp.zeros((1,), jnp.int32))
        srn = self.srnet.init(
            k[2], lq,
            jnp.zeros((1, n, 64, 64, ch[64]), self.dtype),
            jnp.zeros((1, n, 32, 32, ch[32]), self.dtype),
            jnp.zeros((1, 2 * n), self.dtype))
        char = jnp.zeros((1, 128, 128, 3), self.dtype)
        d = self.net_d.init(k[3], char)
        srd = self.net_srd.init(k[4], jnp.concatenate([char, char], -1))
        if self.lpips_variables is None:
            self.lpips_variables = self.lpips.init(k[5], char, char)
        opt = {
            "encoder": self.tx["encoder"].init(enc["params"]),
            "prior": self.tx["prior"].init(pri["params"]),
            "srnet": self.tx["srnet"].init(srn["params"]),
            "net_d": self.tx["net_d"].init(d["params"]),
            "net_srd": self.tx["net_srd"].init(srd["params"]),
        }
        return TrainState(jnp.zeros((), jnp.int32), enc, pri, srn, d, srd,
                          opt)

    # -- eval forward for TB visuals ----------------------------------------

    def visual_forward(self, state: TrainState,
                       batch: TrainBatch) -> Dict[str, jax.Array]:
        """Jittable eval pass for the periodic TensorBoard image grids
        (reference ``tspgan_model.py:244-314``): encoder -> priors -> SR
        with frozen spectral stats. Returns device arrays for
        ``marconet_tpu.train.visuals.build_visual_grids``."""
        b = batch.lq.shape[0]
        n = self.max_chars
        logits, locs_lr, w = self.encoder.apply(
            {"params": state.encoder["params"]}, batch.lq)
        pred_cw = L.lr_to_center_width(locs_lr)
        safe_labels = jnp.where(batch.char_valid > 0, batch.labels,
                                BLANK_INDEX).reshape(-1)
        pri = self.prior.apply({"params": state.prior["params"]},
                               jnp.repeat(w, n, axis=0), safe_labels)
        srnet_eval = StructurePriorSRNet(dim=self.prior.channels[64],
                                         dtype=self.dtype,
                                         update_stats=False)
        sr = srnet_eval.apply(
            {"params": state.srnet["params"],
             "spectral": state.srnet["spectral"]},
            batch.lq,
            pri.feat64.reshape(b, n, *pri.feat64.shape[1:]),
            pri.feat32.reshape(b, n, *pri.feat32.shape[1:]),
            pred_cw, batch.char_valid)
        return {
            "sr": sr,
            "prior128": pri.image.reshape(b, n, 128, 128, 3),
            "pred_cw": pred_cw,
            "pred_ids": jnp.argmax(logits, axis=-1),
        }

    # -- the G phase forward + loss ---------------------------------------

    def _g_loss(self, g_params, state: TrainState, batch: TrainBatch):
        cfg = self.cfg
        metrics = {}
        enc_p, pri_p, srn_p = g_params
        b = batch.lq.shape[0]
        n = self.max_chars

        # 1. encoder
        logits, locs_lr, w = self.encoder.apply({"params": enc_p}, batch.lq)
        pred_cw = L.lr_to_center_width(locs_lr)
        gt_cw = L.lr_to_center_width(batch.boxinfo_lr)

        l_ctc = L.ctc_loss(logits, batch.labels) * cfg.ctc_lambda
        metrics["l_ctc"] = l_ctc

        # 2. localization (reference includes padded slots in the
        # SmoothL1 terms; only the IoU term is validity-masked)
        l_loc_center = L.smooth_l1_loss(
            pred_cw[:, 0::2] * 2048.0, gt_cw[:, 0::2] * 2048.0) \
            * cfg.loc_lambda * 2.0
        l_loc = L.smooth_l1_loss(locs_lr * 2048.0,
                                 batch.boxinfo_lr * 2048.0) * cfg.loc_lambda
        l_iou = L.box_iou_loss(pred_cw, gt_cw, batch.box_valid) \
            * cfg.iou_lambda
        metrics.update(l_loc_center=l_loc_center, l_loc=l_loc,
                       l_loc_iou=l_iou)

        # 3. structure priors for all 16 slots
        safe_labels = jnp.where(batch.char_valid > 0, batch.labels,
                                BLANK_INDEX).reshape(-1)
        styles = jnp.repeat(w, n, axis=0)
        pri = self.prior.apply({"params": pri_p}, styles, safe_labels)
        prior128 = pri.image.reshape(b, n, 128, 128, 3)
        rgb64 = pri.rgb64.reshape(b, n, 64, 64, 3)
        rgb32 = pri.rgb32.reshape(b, n, 32, 32, 3)
        feat64 = pri.feat64.reshape(b, n, *pri.feat64.shape[1:])
        feat32 = pri.feat32.reshape(b, n, *pri.feat32.shape[1:])

        cmask = batch.char_valid[:, :, None, None, None]
        l_pix128 = L.l1_loss(prior128, batch.gt_chars, mask=cmask,
                             weight=cfg.pixel_weight * cfg.lambda128)
        l_iou128 = L.soft_iou_loss(prior128, batch.gt_chars, mask=cmask) \
            * cfg.lambda_pix_iou
        l_pix64 = L.l1_loss(rgb64, _resize_chars(batch.gt_chars, 64),
                            mask=cmask,
                            weight=cfg.pixel_weight * cfg.lambda64)
        l_pix32 = L.l1_loss(rgb32, _resize_chars(batch.gt_chars, 32),
                            mask=cmask,
                            weight=cfg.pixel_weight * cfg.lambda32)
        metrics.update(l_g_pix128=l_pix128, l_g_iou128=l_iou128,
                       l_g_pix64=l_pix64, l_g_pix32=l_pix32)

        # 4. prior GAN loss (D frozen in this phase, stats not updated)
        d_vars = {"params": state.net_d["params"],
                  "spectral": state.net_d["spectral"]}
        fake_pred = self._make_disc(update_stats=False).apply(
            d_vars, prior128.reshape(b * n, 128, 128, 3))
        l_g_gan = L.hinge_g_loss(
            fake_pred.reshape(b, n, -1),
            mask=batch.char_valid[:, :, None]) * cfg.gan_lambda
        metrics["l_g_gan"] = l_g_gan

        # 5. SR (priors + locs detached, train-arch semantics)
        sr, srn_updates = self.srnet.apply(
            {"params": srn_p, "spectral": state.srnet["spectral"]},
            batch.lq,
            jax.lax.stop_gradient(feat64),
            jax.lax.stop_gradient(feat32),
            jax.lax.stop_gradient(pred_cw),
            batch.char_valid, mutable=["spectral"])
        l_sr_pix = L.l1_loss(sr, batch.gt, weight=cfg.srpixel_weight)
        metrics["l_sr_pix"] = l_sr_pix

        # 6. char crops + GAN terms
        sr_chars = crop_chars(sr, batch.crop_idx, batch.crop_w0)
        gt_chars_rgb = crop_chars(batch.gt, batch.crop_idx, batch.crop_w0)

        srd_vars = {"params": state.net_srd["params"],
                    "spectral": state.net_srd["spectral"]}
        fake_srd = self._make_disc(update_stats=False).apply(
            srd_vars,
            jnp.concatenate(
                [sr_chars,
                 jax.lax.stop_gradient(prior128)], -1)
            .reshape(b * n, 128, 128, 6))
        l_sr_gan = L.hinge_g_loss(fake_srd.reshape(b, n, -1),
                                  mask=batch.char_valid[:, :, None]) \
            * cfg.srgan_lambda
        fake_d = self._make_disc(update_stats=False).apply(
            d_vars, sr_chars.reshape(b * n, 128, 128, 3))
        l_sr_rgan = L.hinge_g_loss(fake_d.reshape(b, n, -1),
                                   mask=batch.char_valid[:, :, None]) \
            * cfg.gan_lambda
        metrics.update(l_sr_d_pr=l_sr_gan, l_sr_d_r=l_sr_rgan)

        # 7. perceptual loss on 128px patches
        sr_patches = sr.reshape(b, 128, n, 128, 3).transpose(0, 2, 1, 3, 4)
        gt_patches = batch.gt.reshape(b, 128, n, 128, 3).transpose(
            0, 2, 1, 3, 4)
        lp = self.lpips.apply(self.lpips_variables,
                              sr_patches.reshape(b * n, 128, 128, 3),
                              gt_patches.reshape(b * n, 128, 128, 3))
        l_percep = L.masked_mean(lp.reshape(b, n),
                                 batch.patch_valid) * cfg.lpips_lambda
        metrics["l_sr_percep"] = l_percep

        total = (l_ctc + l_loc_center + l_loc + l_iou + l_pix128 + l_iou128
                 + l_pix64 + l_pix32 + l_g_gan + l_sr_pix + l_sr_gan
                 + l_sr_rgan + l_percep)
        metrics["l_g_total"] = total

        aux = {
            "metrics": metrics,
            "srn_spectral": srn_updates["spectral"],
            "sr_chars": jax.lax.stop_gradient(sr_chars),
            "gt_chars_rgb": jax.lax.stop_gradient(gt_chars_rgb),
            "prior128": jax.lax.stop_gradient(prior128),
        }
        return total, aux

    # -- full step ---------------------------------------------------------

    def train_step(self, state: TrainState,
                   batch: TrainBatch) -> Tuple[TrainState, Dict[str, Any]]:
        cfg = self.cfg
        b = batch.lq.shape[0]
        n = self.max_chars

        # ---- phase G: encoder + prior + SR -----------------------------
        g_params = (state.encoder["params"], state.prior["params"],
                    state.srnet["params"])
        (_, aux), grads = jax.value_and_grad(
            self._g_loss, has_aux=True)(g_params, state, batch)
        metrics = aux["metrics"]

        new_nets = {}
        new_opt = dict(state.opt)
        for name, params, grad in zip(("encoder", "prior", "srnet"),
                                      g_params, grads):
            updates, new_opt[name] = self.tx[name].update(
                grad, state.opt[name], params)
            new_nets[name] = optax.apply_updates(params, updates)

        # ---- phase D: real glyph crops vs SR crops ---------------------
        cmask3 = batch.char_valid[:, :, None]

        def d_loss(d_params, spectral):
            # two forwards (fake then real), as in the reference's D step;
            # also avoids concatenating along the sharded batch axis,
            # which would force an all-to-all resharding
            dnet = self._make_disc(update_stats=True)
            fake, upd = dnet.apply(
                {"params": d_params, "spectral": spectral},
                aux["sr_chars"].reshape(b * n, 128, 128, 3),
                mutable=["spectral"])
            real, upd = dnet.apply(
                {"params": d_params, "spectral": upd["spectral"]},
                aux["gt_chars_rgb"].reshape(b * n, 128, 128, 3),
                mutable=["spectral"])
            loss = L.hinge_d_loss(real.reshape(b, n, -1),
                                  fake.reshape(b, n, -1),
                                  real_mask=cmask3, fake_mask=cmask3)
            return loss, upd["spectral"]

        (l_d, d_spec), d_grads = jax.value_and_grad(d_loss, has_aux=True)(
            state.net_d["params"], state.net_d["spectral"])
        metrics["l_d"] = l_d
        updates, new_opt["net_d"] = self.tx["net_d"].update(
            d_grads, state.opt["net_d"], state.net_d["params"])
        new_d = {"params": optax.apply_updates(state.net_d["params"],
                                               updates),
                 "spectral": d_spec}

        # ---- phase SRD: (gt crop, gt glyph) vs (sr crop, prior) --------
        real_in = jnp.concatenate([aux["gt_chars_rgb"], batch.gt_chars], -1)
        fake_in = jnp.concatenate([aux["sr_chars"], aux["prior128"]], -1)

        def srd_loss(srd_params, spectral):
            dnet = self._make_disc(update_stats=True)
            fake, upd = dnet.apply(
                {"params": srd_params, "spectral": spectral},
                fake_in.reshape(b * n, 128, 128, 6),
                mutable=["spectral"])
            real, upd = dnet.apply(
                {"params": srd_params, "spectral": upd["spectral"]},
                real_in.reshape(b * n, 128, 128, 6),
                mutable=["spectral"])
            loss = L.hinge_d_loss(real.reshape(b, n, -1),
                                  fake.reshape(b, n, -1),
                                  real_mask=cmask3, fake_mask=cmask3)
            return loss, upd["spectral"]

        (l_srd, srd_spec), srd_grads = jax.value_and_grad(
            srd_loss, has_aux=True)(state.net_srd["params"],
                                    state.net_srd["spectral"])
        metrics["l_srd"] = l_srd
        updates, new_opt["net_srd"] = self.tx["net_srd"].update(
            srd_grads, state.opt["net_srd"], state.net_srd["params"])
        new_srd = {"params": optax.apply_updates(state.net_srd["params"],
                                                 updates),
                   "spectral": srd_spec}

        new_state = TrainState(
            step=state.step + 1,
            encoder={"params": new_nets["encoder"]},
            prior={"params": new_nets["prior"]},
            srnet={"params": new_nets["srnet"],
                   "spectral": aux["srn_spectral"]},
            net_d=new_d,
            net_srd=new_srd,
            opt=new_opt,
        )
        return new_state, metrics
