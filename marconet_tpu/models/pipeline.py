"""End-to-end restoration pipeline: encoder -> prior generator -> SR net.

This is the jit-compiled TPU equivalent of the per-image python pipeline in
reference ``test_sr.py:39-232`` (steps 2-4): one static-shape XLA program
per batch size handles any number of characters per line via the padded
16-slot design — no recompilation between images.

The front-end (character detection + recognition, reference step 1) is a
separate component (``marconet_tpu.models.frontend``); this pipeline takes
labels + locs, which also serves the reference's manual-label mode
(``test_sr.py:155-162``).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from marconet_tpu.alphabet import BLANK_INDEX
from marconet_tpu.models.encoder import MAX_CHARS, TextContextEncoder
from marconet_tpu.models.prior import StructurePriorGenerator
from marconet_tpu.models.srnet import StructurePriorSRNet


class MARCONetParams(NamedTuple):
    """Bundled variables of the three core networks."""

    encoder: Any
    prior: Any
    srnet: Any


class RestoreOutput(NamedTuple):
    sr: jax.Array          # (B, 128, 2048, 3) in [-1, 1]
    priors: jax.Array      # (B, 16, 128, 128, 3) per-slot glyph priors
    logits: jax.Array      # (B, 64, 6736) encoder class logits
    pred_locs: jax.Array   # (B, 32) encoder-predicted locs
    w: jax.Array           # (B, 512) font-style vectors


class MARCONet:
    """Restoration pipeline over the three core networks.

    Typical use::

        net = MARCONet()
        params = net.init(jax.random.PRNGKey(0))     # or convert/load
        out = net.restore(params, lq, labels, locs, char_mask)
    """

    def __init__(self, dtype=jnp.float32, num_classes: int = 6736,
                 width: float = 1.0):
        """``width`` scales every channel plan (1.0 = the exact reference
        architecture; reduced widths share the identical code path and
        serve fast CI tiers)."""
        self.dtype = dtype
        self.encoder = TextContextEncoder(num_classes=num_classes,
                                          width=width, dtype=dtype)
        self.prior = StructurePriorGenerator(num_classes=num_classes,
                                             style_dim=self.encoder.w_dim,
                                             width=width, dtype=dtype)
        self.srnet = StructurePriorSRNet(dim=self.prior.channels[64],
                                         dtype=dtype)

    # -- initialization ----------------------------------------------------

    def init(self, key) -> MARCONetParams:
        k1, k2, k3 = jax.random.split(key, 3)
        ch = self.prior.channels
        lq = jnp.zeros((1, 32, 512, 3), self.dtype)
        enc = self.encoder.init(k1, lq)
        pri = self.prior.init(
            k2, jnp.zeros((1, self.encoder.w_dim), self.dtype),
            jnp.zeros((1,), jnp.int32))
        p64 = jnp.zeros((1, MAX_CHARS, 64, 64, ch[64]), self.dtype)
        p32 = jnp.zeros((1, MAX_CHARS, 32, 32, ch[32]), self.dtype)
        locs = jnp.zeros((1, 2 * MAX_CHARS), self.dtype)
        srn = self.srnet.init(k3, lq, p64, p32, locs)
        return MARCONetParams(enc, pri, srn)

    # -- pipeline stages ---------------------------------------------------

    def encode(self, params: MARCONetParams, lq):
        return self.encoder.apply(params.encoder, lq)

    def generate_priors(self, params: MARCONetParams, w, labels):
        """w: (B, 512); labels: (B, N) -> per-slot priors.

        Runs the generator once over the flattened (B*N) slot batch —
        the padded-slot TPU equivalent of the reference's per-character
        generator calls (``test_sr.py:180-190``).
        """
        b, n = labels.shape
        styles = jnp.repeat(w, n, axis=0)  # (B*N, 512)
        out = self.prior.apply(params.prior, styles, labels.reshape(-1))
        return jax.tree.map(
            lambda t: t.reshape(b, n, *t.shape[1:]), out)

    def super_resolve(self, params: MARCONetParams, lq, prior64, prior32,
                      locs, char_mask):
        return self.srnet.apply(params.srnet, lq, prior64, prior32, locs,
                                char_mask)

    # -- end-to-end --------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def restore(self, params: MARCONetParams, lq, labels, locs,
                char_mask) -> RestoreOutput:
        """Restore a batch of LQ text lines.

        Args:
          params: ``MARCONetParams``.
          lq: (B, 32, 512, 3) NHWC, normalized to [-1, 1].
          labels: (B, 16) int32 char labels (pad with blank=6735).
          locs: (B, 32) normalized (center, half-width) pairs (pad 0).
          char_mask: (B, 16) float/bool slot validity.
        """
        logits, pred_locs, w = self.encode(params, lq)
        safe_labels = jnp.where(char_mask > 0, labels, BLANK_INDEX)
        priors = self.generate_priors(params, w, safe_labels)
        sr = self.super_resolve(params, lq, priors.feat64, priors.feat32,
                                locs, char_mask)
        return RestoreOutput(sr, priors.image, logits, pred_locs, w)

    @functools.partial(jax.jit, static_argnums=0)
    def interpolate_styles(self, params: MARCONetParams, w1, w2, labels,
                           weights):
        """Blend two style vectors and render glyph priors per blend.

        The TPU equivalent of reference ``test_w.py:102-115``: one vmapped
        program over the interpolation weights instead of a python loop.

        Args:
          w1, w2: (512,) style vectors.  labels: (N,) char labels.
          weights: (S,) blend weights in [0, 1].
        Returns:
          (S, N, 128, 128, 3) glyph prior images.
        """

        def render(s):
            w = w1 * s + w2 * (1.0 - s)
            n = labels.shape[0]
            out = self.prior.apply(params.prior,
                                   jnp.broadcast_to(w, (n, w.shape[-1])),
                                   labels)
            return out.image

        return jax.vmap(render)(weights)
