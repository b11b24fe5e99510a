"""Training losses.

Covers the reference's loss suite (``Train/tspgan/losses/text_loss.py`` and
the basicsr-built losses wired in ``tspgan_model.py:106-113``): CTC,
weighted text CE, L1, SmoothL1 (Huber beta=1), hinge GAN, soft-IoU on glyph
masks, and the 1-D box IoU location loss — all as masked, batched tensor
ops (the reference computes the loc/IoU terms in B x 16 python loops,
``tspgan_model.py:334-413``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from marconet_tpu.alphabet import BLANK_INDEX


def masked_mean(x, mask, eps: float = 1e-8):
    """Mean of x over elements where mask > 0 (mask broadcastable)."""
    m = jnp.broadcast_to(mask.astype(jnp.float32), x.shape)
    return (x.astype(jnp.float32) * m).sum() / jnp.maximum(m.sum(), eps)


def l1_loss(pred, target, mask=None, weight: float = 1.0):
    d = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    return weight * (d.mean() if mask is None else masked_mean(d, mask))


def smooth_l1_loss(pred, target, mask=None, beta: float = 1.0):
    """torch ``SmoothL1Loss`` (Huber with beta=1)."""
    d = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    loss = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    return loss.mean() if mask is None else masked_mean(loss, mask)


# ---------------------------------------------------------------------------
# recognition losses
# ---------------------------------------------------------------------------


def ctc_loss(logits, labels, blank: int = BLANK_INDEX):
    """CTC with torch ``reduction='mean'`` semantics.

    Args:
      logits: (B, T, C) raw class logits (T=64 tokens).
      labels: (B, S) labels padded with ``blank`` (S=16).
    Returns scalar: mean over batch of (nll / target_length).
    """
    b, t, _ = logits.shape
    label_paddings = (labels == blank).astype(jnp.float32)
    logit_paddings = jnp.zeros((b, t), jnp.float32)
    per_seq = optax.ctc_loss(logits.astype(jnp.float32), logit_paddings,
                             labels, label_paddings, blank_id=blank)
    lengths = jnp.maximum((1.0 - label_paddings).sum(axis=1), 1.0)
    return (per_seq / lengths).mean()


def text_ce_loss(logits, labels, num_classes: int = BLANK_INDEX + 1,
                 empty_weight: float = 0.1):
    """Class-weighted CE with down-weighted blank class (DETR-style;
    reference ``TextCELoss``, ``text_loss.py:33-52``).

    logits: (B, T, C); labels: (B, T) int.
    """
    w = jnp.ones((num_classes,)).at[-1].set(empty_weight)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    wts = w[labels]
    return (nll * wts).sum() / jnp.maximum(wts.sum(), 1e-8)


# ---------------------------------------------------------------------------
# localization losses
# ---------------------------------------------------------------------------


def lr_to_center_width(locs_lr):
    """(B, 2N) (left, right) pairs -> (B, 2N) (center, half-width) pairs
    (reference ``tspgan_model.py:333-337``)."""
    left = locs_lr[:, 0::2]
    right = locs_lr[:, 1::2]
    center = (left + right) / 2.0
    half = (right - left) / 2.0
    out = jnp.stack([center, half], axis=-1)
    return out.reshape(locs_lr.shape)


def box_iou_loss(pred_cw, gt_cw, valid, scale: float = 2048.0):
    """Mean (1 - IoU) over valid 1-D boxes (reference
    ``tspgan_model.py:382-413``).

    pred_cw, gt_cw: (B, 2N) (center, half-width) pairs in [0,1].
    valid: (B, N) box validity.
    """
    pc, pw = pred_cw[:, 0::2] * scale, pred_cw[:, 1::2] * scale
    gc, gw = gt_cw[:, 0::2] * scale, gt_cw[:, 1::2] * scale
    x1, x2 = pc - pw, pc + pw
    g1, g2 = gc - gw, gc + gw
    inter = jnp.maximum(jnp.minimum(x2, g2) - jnp.maximum(x1, g1), 0.0)
    union = (x2 - x1) + (g2 - g1) - inter
    iou = inter / jnp.clip(union, 1e-6)
    return masked_mean(1.0 - iou, valid)


# ---------------------------------------------------------------------------
# GAN + structure losses
# ---------------------------------------------------------------------------


def hinge_g_loss(fake_pred, mask=None):
    """Generator hinge loss: -E[D(fake)] (basicsr ``GANLoss(hinge)``)."""
    if mask is None:
        return -fake_pred.astype(jnp.float32).mean()
    return -masked_mean(fake_pred, mask)


def hinge_d_loss(real_pred, fake_pred, real_mask=None, fake_mask=None):
    """Discriminator hinge loss: E[relu(1-D(real))] + E[relu(1+D(fake))]."""
    lr = jax.nn.relu(1.0 - real_pred.astype(jnp.float32))
    lf = jax.nn.relu(1.0 + fake_pred.astype(jnp.float32))
    lr = lr.mean() if real_mask is None else masked_mean(lr, real_mask)
    lf = lf.mean() if fake_mask is None else masked_mean(lf, fake_mask)
    return lr + lf


def soft_iou_loss(pred, target, mask=None):
    """Soft IoU on [-1,1] glyph images (reference
    ``tspgan_model.py:461-463``)."""
    p = (pred.astype(jnp.float32) + 1.0) / 2.0
    t = (target.astype(jnp.float32) + 1.0) / 2.0
    inter = p * t
    union = p + t - inter
    loss = 1.0 - inter / jnp.clip(union, 1e-6)
    return loss.mean() if mask is None else masked_mean(loss, mask)
