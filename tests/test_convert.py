"""Checkpoint-converter end-to-end tests.

Build state dicts with the released checkpoints' exact key names (random
weights), convert them, and require the JAX models to reproduce the
functional torch oracles' outputs.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from marconet_tpu.convert import (
    convert_encoder,
    convert_prior,
    convert_srnet,
)
from marconet_tpu.models import (
    TextContextEncoder,
    StructurePriorGenerator,
    StructurePriorSRNet,
)
from tests import torch_functional_oracle as oracle


def nchw(x):
    return np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2)))


def nhwc(x):
    return np.ascontiguousarray(np.transpose(x, (0, 2, 3, 1)))


def test_encoder_conversion_end_to_end(rng):
    sd = oracle.build_encoder_state(rng)
    variables = convert_encoder(sd)
    x = rng.uniform(-1, 1, (2, 32, 512, 3)).astype(np.float32)

    want_logits, want_locs, want_w = oracle.encoder_forward(sd, nchw(x))
    got = TextContextEncoder().apply(
        jax.tree.map(jnp.asarray, variables), jnp.asarray(x))
    got_logits, got_locs, got_w = map(np.asarray, got)

    np.testing.assert_allclose(got_logits, want_logits, rtol=2e-3,
                               atol=2e-3)
    np.testing.assert_allclose(got_locs, want_locs, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(got_w, want_w, rtol=2e-3, atol=2e-3)


def test_prior_conversion_end_to_end(rng):
    num_classes = 64  # small codebook keeps the test light
    sd = oracle.build_prior_state(rng, num_classes=num_classes)
    variables = convert_prior(sd)
    styles = rng.standard_normal((3, 512)).astype(np.float32)
    labels = np.array([1, 17, 63])

    want_img, want_f64, want_f32 = oracle.prior_forward(sd, styles, labels)
    m = StructurePriorGenerator(num_classes=num_classes)
    out = m.apply(jax.tree.map(jnp.asarray, variables),
                  jnp.asarray(styles), jnp.asarray(labels))

    np.testing.assert_allclose(np.asarray(out.image), nhwc(want_img),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.feat64), nhwc(want_f64),
                               rtol=1e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(out.feat32), nhwc(want_f32),
                               rtol=1e-3, atol=2e-2)


@pytest.fixture(scope="module")
def srnet_converted():
    """One fabricated srnet state dict + conversion shared by the three
    window-geometry cases (the conversion itself is case-independent)."""
    rng = np.random.default_rng(42)
    sd = oracle.build_srnet_state(rng)
    return sd, convert_srnet(sd)


@pytest.mark.parametrize("centers", [
    [0.1, 0.35, 0.62, 0.9],        # interior chars
    [0.01, 0.5, 0.99],             # truncated edge windows
    # heavily overlapping windows: full-size torch-oracle case is
    # RUN_SLOW-gated (~30 s) — overlap/last-writer-wins semantics stay
    # pinned in the default tier at reduced size
    # (test_models.py::TestSFTFold::test_writeback_direct_equivalent)
    pytest.param([0.3, 0.317, 0.335, 0.36],
                 marks=pytest.mark.skipif(
                     not os.environ.get("RUN_SLOW"),
                     reason="full-size overlap case; set RUN_SLOW=1")),
])
def test_srnet_conversion_end_to_end(rng, srnet_converted, centers):
    sd, variables = srnet_converted

    n = len(centers)
    lq = rng.uniform(-1, 1, (1, 32, 512, 3)).astype(np.float32)
    p64 = (rng.standard_normal((n, 64, 64, 256)) * 0.3).astype(np.float32)
    p32 = (rng.standard_normal((n, 32, 32, 512)) * 0.3).astype(np.float32)
    locs_t = np.zeros((1, 2 * n), np.float32)
    locs_t[0, 0::2] = centers
    locs_t[0, 1::2] = 0.03

    want = oracle.srnet_forward(sd, nchw(lq), nchw(p64), nchw(p32), locs_t)

    # pad to the 16-slot static layout
    N = 16
    p64p = np.zeros((1, N, 64, 64, 256), np.float32)
    p32p = np.zeros((1, N, 32, 32, 512), np.float32)
    p64p[0, :n] = p64
    p32p[0, :n] = p32
    locs = np.zeros((1, 2 * N), np.float32)
    locs[0, :2 * n] = locs_t[0]
    mask = np.zeros((1, N), np.float32)
    mask[0, :n] = 1.0

    got = StructurePriorSRNet().apply(
        jax.tree.map(jnp.asarray, variables), jnp.asarray(lq),
        jnp.asarray(p64p), jnp.asarray(p32p), jnp.asarray(locs),
        jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), nhwc(want), rtol=1e-3,
                               atol=2e-3)


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="full-size 3-net chain compile; set RUN_SLOW=1")
def test_full_pipeline_chain_matches_torch(rng):
    """Chain encoder -> TSPGAN -> TSPSRNet through the torch functional
    oracles (reference ``test_sr.py:145-197`` steps 2-4: predict w, render
    per-char priors from w, SR with prior features + locs) and require
    ``MARCONet.restore`` on the SAME converted state dicts to reproduce
    the final SR tensor — this pins the cross-net seams (w hand-off,
    padded-slot prior reshape, locs pass-through) that the per-net
    conversion tests above cannot see."""
    sd_enc = oracle.build_encoder_state(rng)
    sd_pri = oracle.build_prior_state(rng)  # full 6736-class codebook
    sd_srn = oracle.build_srnet_state(rng)

    lq = rng.uniform(-1, 1, (1, 32, 512, 3)).astype(np.float32)
    n = 3
    labels_t = np.array([1, 17, 6000])
    centers = [0.1, 0.45, 0.8]
    locs_t = np.zeros((1, 2 * n), np.float32)
    locs_t[0, 0::2] = centers
    locs_t[0, 1::2] = 0.03

    # torch oracle chain (per-character, n real slots only)
    _, _, want_w = oracle.encoder_forward(sd_enc, nchw(lq))
    styles = np.repeat(np.asarray(want_w), n, axis=0)
    want_img, want_f64, want_f32 = oracle.prior_forward(
        sd_pri, styles, labels_t)
    want_sr = oracle.srnet_forward(sd_srn, nchw(lq), want_f64, want_f32,
                                   locs_t)

    # JAX pipeline on the converted state dicts (padded 16-slot program)
    from marconet_tpu.models.pipeline import MARCONet, MARCONetParams

    params = MARCONetParams(
        jax.tree.map(jnp.asarray, convert_encoder(sd_enc)),
        jax.tree.map(jnp.asarray, convert_prior(sd_pri)),
        jax.tree.map(jnp.asarray, convert_srnet(sd_srn)))
    net = MARCONet()

    N = 16
    labels = np.full((1, N), 6735, np.int32)
    labels[0, :n] = labels_t
    locs = np.zeros((1, 2 * N), np.float32)
    locs[0, :2 * n] = locs_t[0]
    mask = np.zeros((1, N), np.float32)
    mask[0, :n] = 1.0

    out = net.restore(params, jnp.asarray(lq), jnp.asarray(labels),
                      jnp.asarray(locs), jnp.asarray(mask))

    np.testing.assert_allclose(np.asarray(out.w), np.asarray(want_w),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.priors[0, :n]),
                               nhwc(want_img), rtol=2e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out.sr), nhwc(want_sr),
                               rtol=2e-3, atol=5e-3)
