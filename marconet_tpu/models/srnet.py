"""Structure-prior SR network: x4 text-line super-resolution with
per-character SFT (spatial feature transform) fusion.

Parity target: ``TSPSRNet`` in reference ``models/networks.py:328-485``
(16.87 M parameters).

TPU-first redesign of the fusion. The reference runs two nested python
loops over (batch, character), dynamically slicing a variable-width window
per character, AdaIN-ing the character's prior features into the window's
statistics, running three small conv stacks, and writing the SFT residual
back into a canvas where later characters overwrite earlier ones
(``networks.py:411-485``). Here the same math is a fixed-shape batched
program:

* each of the 16 character slots extracts a constant-width window
  (2*half_width) from a right-padded canvas with ``dynamic_slice``;
* truncated edge windows are handled with a column-validity mask — convs
  see zeros beyond the valid columns exactly like the reference's zero
  padding, and GroupNorm/AdaIN statistics are computed over valid columns
  only (numerically identical to slicing the exact window);
* all (B x 16) windows run through the conv stacks as ONE batched conv —
  MXU-friendly — instead of 16 sequential tiny convs;
* the write-back computes, per output column, the winning (highest
  valid) slot and gathers its window column through a one-hot selection
  matmul on the MXU — preserving the reference's deterministic
  last-writer-wins overlap semantics in one batched program (an opt-in
  Pallas RMW kernel formulation exists in ``ops/pallas_sft.py``).

Window geometry (reference ``networks.py:427-441,460-474``): the predicted
width is computed then overwritten by a constant half-width (16 at the
32-high scale, 32 at the 64-high scale); ``x1 = max(center - hw, 0)``,
``x2 = min(center + hw, W)``, and the prior crop of length ``L = x2 - x1``
is centered: ``y1 = hw - L // 2``.
"""

from __future__ import annotations

import os
from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from marconet_tpu.ops import pallas_sft
from marconet_tpu.ops.layers import (
    Conv,
    ResTextBlockV2,
    SNConv,
    adaptive_instance_norm,
    leaky_relu,
)
from marconet_tpu.ops.phase import phase_unpack
from marconet_tpu.ops.resize import upsample2x_bilinear
from marconet_tpu.ops.widthfold import wunfold
from marconet_tpu.ops.window import gather_windows, gather_windows_per_slot

Dtype = Any

MAX_CHARS = 16


class SNStack(nn.Module):
    """SNConv -> LeakyReLU(0.2) -> SNConv with per-conv column masking.

    Masking after each conv keeps invalid window columns at the values the
    reference's exact-width slices would produce at the valid/invalid
    boundary (zero padding).
    """

    features: int
    update_stats: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, *, kernels_only: bool = False):
        if kernels_only:
            # normalized (w, bias) of both convs, without applying them —
            # for the paired scale/shift formulation (see SFTFusion)
            k1 = SNConv(self.features, update_stats=self.update_stats,
                        dtype=self.dtype, name="conv1")(
                x, kernels_only=True)
            k2 = SNConv(self.features, update_stats=self.update_stats,
                        dtype=self.dtype, name="conv2")(
                jnp.zeros((1, 1, 1, self.features), x.dtype),
                kernels_only=True)
            return k1, k2
        x = SNConv(self.features, update_stats=self.update_stats,
                   dtype=self.dtype, name="conv1")(x)
        if mask is not None:
            x = x * mask.astype(x.dtype)
        x = leaky_relu(x)
        x = SNConv(self.features, update_stats=self.update_stats,
                   dtype=self.dtype, name="conv2")(x)
        if mask is not None:
            x = x * mask.astype(x.dtype)
        return x


def _window_geometry(locs, half_width: int, width: int):
    """Static-shape window geometry for all 16 slots.

    Args:
      locs: (B, 2*MAX_CHARS) normalized (center, half-width) pairs.
      half_width: constant half-width at this scale (16 or 32).
      width: canvas width at this scale (512 or 1024).
    Returns:
      x1 (B, N) int32 window starts, L (B, N) valid lengths,
      y1 (B, N) prior-crop starts.
    """
    centers = locs[:, 0::2]  # (B, N)
    center = jnp.floor(centers.astype(jnp.float32) * width).astype(jnp.int32)
    x1 = jnp.maximum(center - half_width, 0)
    x2 = jnp.minimum(center + half_width, width)
    x2 = jnp.maximum(x2, x1)  # degenerate centers outside the canvas
    L = x2 - x1
    y1 = half_width - L // 2
    return x1, L, y1


# window gathers live in ops/window.py: batched dynamic-slice forward
# (the fastest formulation probed) with a custom VJP whose scatter-add
# transpose is a one-hot MXU matmul instead of N sequential
# dynamic-update-slice canvas passes (the round-3 G-phase bottleneck).


def _tpu_backend() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _sft_fold_default() -> bool:
    """Folded AdaIN+norm1 formulation: measured +4.9 crops/s e2e on v5e
    (round-4 chip A/B, BENCH_NOTES.md), so it is the TPU default; on CPU
    it only adds XLA:CPU compile surface, so the plain path stays.
    ``MARCONET_SFT_FOLD=0/1`` forces either way; exact re-bracketing
    either way (tests/test_models.py::TestSFTFold)."""
    env = os.environ.get("MARCONET_SFT_FOLD")
    if env is not None:
        return env == "1"
    return _tpu_backend()


def _sft_wb_default() -> str:
    """Write-back formulation: 'direct' contracts the one-hot selection
    against the windows' native (B,N,H,win,C) layout (+1.6 crops/s on
    v5e, round-4 A/B); 'flat' pre-transposes; 'take' replaces the
    selection einsum with a per-column row gather (take_along_axis) —
    pure data movement instead of ~0.55 TFLOP/batch of artificial
    contraction at the 64-high shape (probe tools/probe_writeback.py).
    ``MARCONET_SFT_WB`` forces; all exact
    (tests/test_models.py::TestSFTFold::test_writeback_direct_equivalent).
    """
    env = os.environ.get("MARCONET_SFT_WB")
    if env is not None:
        return env
    return "direct" if _tpu_backend() else "flat"


def _sft_gather_default() -> str:
    """Window-gather formulation: 'padded' right-pads the canvas by hw
    so every ``dynamic_slice`` start is in range (a full-canvas copy per
    SFT scale, ~1.3 ms at the 64-high shape); 'padfree' gathers from the
    unpadded canvas with starts clamped to ``W - win`` and rebases the
    column-validity mask / prior crop / write-back selection by the
    clamp offset — exactly the same math (the rebased mask zeroes the
    same columns the pad's zeros occupied). Chip A/B (round 4,
    BENCH_NOTES.md): padfree 119.95 vs padded 118.85 crops/s e2e, so it
    is the TPU default; on CPU it only adds compile surface.
    ``MARCONET_SFT_GATHER`` forces; both exact
    (tests/test_models.py::TestSFTFold::test_padfree_gather_equivalent)."""
    env = os.environ.get("MARCONET_SFT_GATHER")
    if env is not None:
        return env
    return "padfree" if _tpu_backend() else "padded"


def _sft_prior_default() -> str:
    """Prior-crop formulation inside the pad-free gather: 'gather' pads
    the priors both sides by hw and dynamic-slices per slot; 'shiftmm'
    applies the per-slot column shift as a one-hot matmul with no pad
    copy at all. Both exact
    (tests/test_models.py::TestSFTFold::test_padfree_gather_equivalent).
    ``MARCONET_SFT_PRIOR`` forces; default 'shiftmm': chip A/B measured
    123.9 / 123.2 crops/s e2e on two independent runs vs 120.2 for
    'gather' (BENCH_NOTES.md round-5 table). Only read on the padfree
    path, which is itself TPU-gated."""
    env = os.environ.get("MARCONET_SFT_PRIOR")
    if env is not None:
        return env
    return "shiftmm"


class SFTFusion(nn.Module):
    """One scale of per-character SFT fusion (batched, masked)."""

    half_width: int
    features: int = 256
    update_stats: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, canvas, priors, locs, char_mask):
        """
        Args:
          canvas: (B, H, W, C) LQ feature canvas at this scale.
          priors: (B, N, H, 2*hw, C) per-slot prior features (same C).
          locs: (B, 2N) normalized (center, half-width) pairs.
          char_mask: (B, N) slot validity.
        Returns:
          canvas + residual, reference overlap semantics.
        """
        b, h, width, c = canvas.shape
        n = priors.shape[1]
        hw = self.half_width
        win = 2 * hw

        x1, L, y1 = _window_geometry(locs, hw, width)

        use_pallas = (pallas_sft.use_pallas_sft(self.update_stats, c)
                      and width % 16 == 0 and win % 16 == 0
                      and width >= win + 16)
        # the opt-in Pallas write-back assumes window col v <-> canvas
        # col x1+v, so it requires the padded gather layout; clamped
        # starts also need the canvas to be at least one window wide
        padfree = (not use_pallas) and width >= win \
            and _sft_gather_default() == "padfree"

        cols = jnp.arange(win)
        if padfree:
            # gather from the UNPADDED canvas with starts clamped into
            # range; window col v holds canvas col x1c+v, and canvas
            # cols x1..x1+L-1 live at window cols off..off+L-1
            x1c = jnp.minimum(x1, width - win)
            off = x1 - x1c  # nonzero only for right-edge windows
            colmask = ((cols[None, None, :] >= off[:, :, None]) &
                       (cols[None, None, :] <
                        (off + L)[:, :, None])).astype(canvas.dtype)
        else:
            x1c = x1
            off = None
            colmask = (cols[None, None, :] <
                       L[:, :, None]).astype(canvas.dtype)
        # column-validity mask (B, N, 1, win, 1)
        colmask = colmask[:, :, None, :, None]

        # flatten slots into the batch: one big conv program
        def flat(t):
            return t.reshape(b * n, h, win, t.shape[-1])

        m = colmask.reshape(b * n, 1, win, 1)

        if padfree:
            lq_win = gather_windows(canvas, x1c, win)  # (B, N, H, win, C)
            # prior crop rebased by the clamp offset: window col v holds
            # prior col y1+v-off, and y1-off spans [-hw, hw]
            if _sft_prior_default() == "shiftmm":
                # pad-free per-slot shift as a one-hot matmul: window
                # col v picks prior col v+s (out-of-range -> zero row,
                # exactly the pad's zeros); one 2*B*N*win^2*H*C-FLOP
                # einsum (~17 GFLOP at the 64-high shape, trivial on
                # the MXU) instead of a both-sides pad copy + gather,
                # and its autodiff transpose is the same einsum
                shift = (y1 - off)[:, :, None, None]       # (B, N, 1, 1)
                u = jnp.arange(win)
                sel = (u[None, None, None, :] ==
                       (u[None, None, :, None] + shift))   # (B,N,v,u)
                prior_win = jnp.einsum(
                    "bnvu,bnhuc->bnhvc", sel.astype(priors.dtype),
                    priors, preferred_element_type=priors.dtype)
            else:
                # pad both sides by hw and gather at y1-off+hw in
                # [0, 2*hw]
                prior_pad = jnp.pad(priors, ((0, 0), (0, 0), (0, 0),
                                             (hw, hw), (0, 0)))
                prior_win = gather_windows_per_slot(prior_pad,
                                                    y1 - off + hw, win)
        else:
            # windows from the right-padded canvas — constant width
            # `win`; hw pad suffices: x1 <= W - hw - 1, so
            # x1 + win <= W + hw - 1
            padded = jnp.pad(canvas, ((0, 0), (0, 0), (0, hw), (0, 0)))
            lq_win = gather_windows(padded, x1, win)

            # prior crop: cols y1..y1+L map to window cols 0..L; y1 <= hw
            prior_pad = jnp.pad(priors, ((0, 0), (0, 0), (0, 0), (0, hw),
                                         (0, 0)))
            prior_win = gather_windows_per_slot(prior_pad, y1, win)

        lq_f, prior_f = flat(lq_win), flat(prior_win)
        lq_f = lq_f * m.astype(lq_f.dtype)
        prior_f = prior_f * m.astype(prior_f.dtype)

        if _sft_fold_default():
            # folded formulation: AdaIN + the fuse block's norm1 collapse
            # into one per-channel affine (AdaIN is a per-channel affine
            # of the raw prior windows, and norm1's group stats of that
            # affine follow analytically from the same per-channel
            # moments) — one moments pass + one fused affine/swish pass
            # instead of materializing the AdaIN output and re-reducing
            # the 2F-channel concat. Exact re-bracketing
            # (tests/test_models.py::TestSFTFold).
            zf = prior_f.astype(jnp.float32)
            lf = lq_f.astype(jnp.float32)
            bn = b * n
            nvalid = m.astype(jnp.float32).reshape(bn, win).sum(-1) * h
            n1 = jnp.maximum(nvalid, 1.0)[:, None]       # (BN, 1)
            pm = zf.sum(axis=(1, 2)) / n1                # (BN, C)
            pe2 = jnp.square(zf).sum(axis=(1, 2)) / n1
            lm = lf.sum(axis=(1, 2)) / n1
            le2 = jnp.square(lf).sum(axis=(1, 2)) / n1
            corr = n1 / jnp.maximum(n1 - 1.0, 1.0)       # unbiased (AdaIN)
            pstd = jnp.sqrt(jnp.maximum(pe2 - jnp.square(pm), 0.0)
                            * corr + 1e-5)
            lstd = jnp.sqrt(jnp.maximum(le2 - jnp.square(lm), 0.0)
                            * corr + 1e-5)
            a_aff = lstd / pstd
            b_aff = lm - pm * a_aff
            mu_cat = jnp.concatenate([a_aff * pm + b_aff, lm], axis=-1)
            e2_cat = jnp.concatenate(
                [jnp.square(a_aff) * pe2 + 2.0 * a_aff * b_aff * pm
                 + jnp.square(b_aff), le2], axis=-1)
            fuse = ResTextBlockV2(self.features,
                                  update_stats=self.update_stats,
                                  dtype=self.dtype, name="fuse")(
                None, mask=m,
                fold={"z": prior_f, "lq": lq_f, "a": a_aff, "b": b_aff,
                      "mu": mu_cat, "e2": e2_cat})
        else:
            adain = adaptive_instance_norm(prior_f, lq_f, prior_mask=m,
                                           lq_mask=m)
            fuse = ResTextBlockV2(self.features,
                                  update_stats=self.update_stats,
                                  dtype=self.dtype, name="fuse")(
                jnp.concatenate([adain, lq_f], axis=-1), mask=m)
        if os.environ.get("MARCONET_SFT_PAIR", "0") == "1":
            # paired formulation: scale/conv1 and shift/conv1 both read
            # `fuse`, so run them as ONE 2F-wide conv (a conv distributes
            # over output-channel concat — exact) — one pass over the
            # ~0.5 GB `fuse` tensor instead of two, and a wider MXU
            # contraction. Parameter tree identical to the plain path.
            # Chip A/B (round 4): e2e 105.6 paired vs 107.8 separate —
            # the 2F-wide conv loses to two F-wide convs at these shapes
            # (BENCH_NOTES.md), so the default is OFF; kept opt-in for
            # other shapes.
            fs = self.features
            (w1s, b1s), (w2s, b2s) = SNStack(
                fs, update_stats=self.update_stats, dtype=self.dtype,
                name="scale")(fuse, kernels_only=True)
            (w1h, b1h), (w2h, b2h) = SNStack(
                fs, update_stats=self.update_stats, dtype=self.dtype,
                name="shift")(fuse, kernels_only=True)

            def conv(v, w):
                return jax.lax.conv_general_dilated(
                    v, w, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))

            y = conv(fuse.astype(self.dtype),
                     jnp.concatenate([w1s, w1h], axis=-1)) \
                + jnp.concatenate([b1s, b1h])
            y = leaky_relu(y * m.astype(y.dtype))
            scale = conv(y[..., :fs], w2s) + b2s
            shift = conv(y[..., fs:], w2h) + b2h
            scale = scale * m.astype(scale.dtype)
            shift = shift * m.astype(shift.dtype)
        else:
            scale = SNStack(self.features, update_stats=self.update_stats,
                            dtype=self.dtype, name="scale")(fuse, mask=m)
            shift = SNStack(self.features, update_stats=self.update_stats,
                            dtype=self.dtype, name="shift")(fuse, mask=m)
        out_win = (lq_f * scale + shift).reshape(b, n, h, win, c)

        if use_pallas:
            # opt-in Pallas write-back: sequential RMW window DMAs with
            # the reference's overlap semantics — the formulation for
            # shapes where the selection matmul below would dominate
            return pallas_sft.sft_writeback(canvas, out_win, x1, L,
                                            char_mask)

        # Write-back with the reference's last-writer-wins overlap
        # semantics (chars are written in slot order; later slots
        # overwrite earlier ones, ``networks.py:448,481``). Rather than 16
        # sequential full-canvas dynamic updates (O(N * canvas) HBM
        # traffic), compute per output column which slot wins — the
        # highest valid slot covering it — and gather its window column.
        xcols = jnp.arange(width)[None, None, :]                  # (1,1,W)
        covers = ((xcols >= x1[:, :, None]) &
                  (xcols < (x1 + L)[:, :, None]) &
                  (char_mask[:, :, None] > 0))                    # (B,N,W)
        slot_rank = jnp.where(covers, jnp.arange(n)[None, :, None], -1)
        winner = slot_rank.max(axis=1)                            # (B,W)
        if _sft_wb_default() == "take":
            # row-gather formulation: the selection is pure data
            # movement (one (H*C)-contiguous row per output column), so
            # express it as take_along_axis instead of an einsum whose
            # ~0.55 TFLOP/batch at the 64-high shape is artificial work
            # (probe: tools/probe_writeback.py)
            xc = jnp.take_along_axis(x1c, jnp.maximum(winner, 0), axis=1)
            v = jnp.arange(width)[None, :] - xc                   # (B, W)
            idx = (jnp.maximum(winner, 0) * win
                   + jnp.clip(v, 0, win - 1))
            flat = out_win.transpose(0, 1, 3, 2, 4).reshape(
                b, n * win, h * c)
            res = jnp.take_along_axis(flat, idx[:, :, None], axis=1)
            live = ((winner >= 0) & (v >= 0) & (v < win))[:, :, None]
            res = jnp.where(live, res, 0).reshape(b, width, h, c)
            return canvas + res.transpose(0, 2, 1, 3)
        # One-hot selection matrix (B, W, N*win): column x selects window
        # column (x - x1) of its winning slot. Expressed as a matmul so
        # the selection runs on the MXU (a general gather would not
        # vectorize on TPU).
        sel_slot = (winner[:, :, None] ==
                    jnp.arange(n)[None, None, :])                 # (B,W,N)
        # output column w takes window column w - x1c of its winning
        # slot (x1c == x1 in the padded layout; in the pad-free layout
        # the clamp offset shifts window coords by off = x1 - x1c)
        rel = (jnp.arange(width)[None, :, None] -
               x1c[:, None, :])                                   # (B,W,N)
        sel_col = (rel[..., None] ==
                   jnp.arange(win)[None, None, None, :])          # (B,W,N,win)
        sel = (sel_slot[..., None] & sel_col).astype(canvas.dtype)
        # each output column selects exactly one window column, so
        # low-precision accumulation is exact here
        if _sft_wb_default() == "direct":
            # contract (n, win) directly against the windows' native
            # (B, N, H, win, C) layout — no explicit pre-transpose; XLA
            # picks the contraction layout
            res = jnp.einsum("bwnv,bnhvc->bhwc", sel, out_win,
                             preferred_element_type=canvas.dtype)
            return canvas + res
        flat = out_win.transpose(0, 1, 3, 2, 4).reshape(b, n * win, h * c)
        res = jnp.einsum("bwk,bkf->bwf", sel.reshape(b, width, n * win),
                         flat, preferred_element_type=canvas.dtype)
        res = res.reshape(b, width, h, c)
        return canvas + res.transpose(0, 2, 1, 3)


def _tail_form_default() -> str:
    """Resolve the final-chain layout at trace time.

    Forms (all exact re-bracketings of the same parameters, pinned in
    tests/test_models.py):
      ``plain`` — hi-res 128x2048 convs (the CPU/test default: the
        alternative layouts only inflate XLA:CPU compile time);
      ``phase`` — 2x2 subpixel phases packed into channels
        (``ops/phase.py``);
      ``wfold`` — hi-res columns width-folded into channels
        (``ops/widthfold``), entered DIRECTLY by final_b's
        lhs-H-dilated fused upsample-conv (no relayout). The TPU
        default: chip A/B 118.1 vs 114.4 crops/s e2e over the phase
        tail (BENCH_NOTES.md round 4).

    ``MARCONET_TAIL=plain|phase|wfold`` forces; the older
    ``MARCONET_PHASE_TAIL=0/1`` still forces plain/phase.
    """
    env = os.environ.get("MARCONET_TAIL")
    if env is not None:
        return env
    env = os.environ.get("MARCONET_PHASE_TAIL")
    if env is not None:
        return "phase" if env == "1" else "plain"
    try:
        return "wfold" if jax.default_backend() == "tpu" else "plain"
    except Exception:  # pragma: no cover
        return "plain"


class StructurePriorSRNet(nn.Module):
    """The reference's ``TSPSRNet``: encoder/decoder + 2-scale SFT fusion.

    ``phase_tail`` runs the final chain (final_b/final_res/final_out) in
    the phase-separated 2x2-subpixel layout (``ops/phase.py``): the
    64/128-channel convs on the 128 x 2048 canvas are layout-bound at 31%
    MXU; the exact same math on the half-res grid with phases packed into
    channels measures ~1.5x faster per conv on v5e (BENCH_NOTES.md).
    Identical parameters and numerics either way (pinned in
    tests/test_models.py). Default (``phase_tail=None``) resolves by
    backend — on by default on TPU, off on CPU where it only inflates
    XLA:CPU compile time; env ``MARCONET_PHASE_TAIL=0/1`` forces either
    way for A/B timing.
    """

    dim: int = 256
    update_stats: bool = False
    phase_tail: bool | None = None  # back-compat: True/False = phase/plain
    tail_form: str | None = None    # 'plain'|'phase'|'wfold'; None = env
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, lq, prior64, prior32, locs, char_mask=None):
        """
        Args:
          lq: (B, 32, 512, 3) NHWC in [-1, 1].
          prior64: (B, N, 64, 64, 256) per-character 64x64 prior features.
          prior32: (B, N, 32, 32, 512) per-character 32x32 prior features.
          locs: (B, 2N) normalized (center, half-width) pairs.
          char_mask: (B, N) slot validity (defaults to all-valid).
        Returns:
          (B, 128, 2048, 3) x4 SR output in [-1, 1].
        """
        d = self.dim
        b, _, _, _ = lq.shape
        n = prior64.shape[1]
        if char_mask is None:
            char_mask = jnp.ones((b, n), self.dtype)
        us, dt = self.update_stats, self.dtype

        def sn(feats, strides=(1, 1), name=""):
            return SNConv(feats, strides=strides, update_stats=us, dtype=dt,
                          name=name)

        # encoder pyramid (heights 32 -> 16 -> 8)
        f32 = leaky_relu(sn(d // 4, name="first_32")(lq))
        f16 = leaky_relu(sn(d // 2, strides=(2, 2), name="first_16")(f32))
        f8 = sn(d, name="first_8b")(
            leaky_relu(sn(d, strides=(2, 2), name="first_8a")(f16)))

        # decoder with skip concat
        s16 = sn(d, name="body_16b")(leaky_relu(sn(d, name="body_16a")(
            jnp.concatenate([upsample2x_bilinear(f8), f16], axis=-1))))
        s32 = sn(d, name="body_32b")(leaky_relu(sn(d, name="body_32a")(
            jnp.concatenate([upsample2x_bilinear(s16), f32], axis=-1))))

        # ---- SFT at the 32-high scale (canvas 32 x 512) ----
        p32 = prior32.reshape(b * n, *prior32.shape[2:])
        p32 = SNStack(d, update_stats=us, dtype=dt, name="to256")(p32)
        p32 = p32.reshape(b, n, *p32.shape[1:])
        s32 = SFTFusion(half_width=16, features=d, update_stats=us,
                        dtype=dt, name="sft_32")(s32, p32, locs, char_mask)

        # up to the 64-high scale (plain upsample + conv: at 256 ch the
        # conv runs at ~78% MXU and the phase/composed upconv forms
        # measured slower here — the unpack relayout + border machinery
        # cost more than the upsample they remove; BENCH_NOTES.md)
        x = leaky_relu(sn(d, name="up_a")(upsample2x_bilinear(s32)))
        x = ResTextBlockV2(d, update_stats=us, dtype=dt, name="up_res")(x)
        s64 = sn(d, name="up_b")(x)

        # ---- SFT at the 64-high scale (canvas 64 x 1024) ----
        s64 = SFTFusion(half_width=32, features=d, update_stats=us,
                        dtype=dt, name="sft_64")(s64, prior64, locs,
                                                 char_mask)

        # final x2 to 128 x 2048; the upsample is folded into final_b
        # (exact composition — ops/resize.conv3x3_after_upsample2x)
        x = leaky_relu(sn(d // 2, name="final_a")(s64))
        if self.phase_tail is not None:
            tail = "phase" if self.phase_tail else "plain"
        elif self.tail_form is not None:
            tail = self.tail_form
        else:
            tail = _tail_form_default()
        if tail == "phase":
            # phase-separated layout to the very end: final_b emits the
            # hi-res canvas as (B, 64, 1024, 4*(d//4)) subpixel phases,
            # final_res/final_out consume it in place, and one cheap
            # depth-to-space after tanh materializes the 128 x 2048 image
            x = leaky_relu(SNConv(d // 4, update_stats=us, dtype=dt,
                                  pre_upsample=True, phase_output=True,
                                  name="final_b")(x))
            x = ResTextBlockV2(d // 4, update_stats=us, dtype=dt,
                               phase=True, name="final_res")(x)
            x = SNConv(3, update_stats=us, dtype=dt, phase_input=True,
                       name="final_out")(x)
            return phase_unpack(jnp.tanh(x))
        if tail == "wfold":
            # width-folded layout (ops/widthfold): final_b emits the
            # folded hi-res canvas DIRECTLY as one lhs-H-dilated conv
            # (no phase->wfold relayout transpose — the transpose cost
            # ~7 ms and ate the folded convs' win, probe
            # tools/probe_tail_entry.py: 15.8 ms direct vs 21.9 phase
            # vs 20.3 transpose-entry for the full tail); the rest of
            # the chain runs as 2x-channel folded convs and the final
            # unfold back to 128 x 2048 is a free reshape
            x = leaky_relu(SNConv(d // 4, update_stats=us, dtype=dt,
                                  pre_upsample=True, wfold_output=True,
                                  name="final_b")(x))
            x = ResTextBlockV2(d // 4, update_stats=us, dtype=dt,
                               wfold=True, name="final_res")(x)
            x = SNConv(3, update_stats=us, dtype=dt, wfold_input=True,
                       name="final_out")(x)
            return wunfold(jnp.tanh(x), 2)
        assert tail == "plain", tail
        x = leaky_relu(SNConv(d // 4, update_stats=us, dtype=dt,
                              pre_upsample=True, name="final_b")(x))
        x = ResTextBlockV2(d // 4, update_stats=us, dtype=dt,
                           name="final_res")(x)
        x = sn(3, name="final_out")(x)
        return jnp.tanh(x)
