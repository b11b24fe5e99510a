"""Numerics of core ops vs independent PyTorch oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from marconet_tpu.ops import (
    fused_leaky_relu,
    upsample2x_bilinear,
    EqualLinear,
    PixelNorm,
    GroupNorm,
    SNConv,
    ModulatedConv2d,
    adaptive_instance_norm,
)
from tests import torch_oracles as oracle


def test_fused_leaky_relu_matches_oracle(rng):
    x = rng.standard_normal((4, 7, 9, 16), dtype=np.float32)
    b = rng.standard_normal(16).astype(np.float32)
    got = np.asarray(fused_leaky_relu(jnp.asarray(x), jnp.asarray(b)))
    want = oracle.fused_lrelu(x, b)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_fused_leaky_relu_grad(rng):
    x = rng.standard_normal((8, 16), dtype=np.float32)
    b = rng.standard_normal(16).astype(np.float32)

    def f(x, b):
        return fused_leaky_relu(x, b).sum()

    gx, gb = jax.grad(f, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(b))
    # analytic: d/dx = scale * (slope or 1)
    pre = x + b[None, :]
    want_gx = np.where(pre >= 0, np.sqrt(2.0), 0.2 * np.sqrt(2.0))
    np.testing.assert_allclose(np.asarray(gx), want_gx, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gb), want_gx.sum(0), rtol=1e-5)


def test_upsample2x_bilinear_matches_torch(rng):
    x = rng.standard_normal((2, 5, 11, 3), dtype=np.float32)
    got = np.asarray(upsample2x_bilinear(jnp.asarray(x)))
    want = oracle.upsample2x_bilinear_nhwc(x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_upsample2x_matmul_matches_torch(rng):
    from marconet_tpu.ops.resize import upsample2x_matmul

    x = rng.standard_normal((2, 5, 11, 3), dtype=np.float32)
    got = np.asarray(upsample2x_matmul(jnp.asarray(x)))
    want = oracle.upsample2x_bilinear_nhwc(x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("fused", [False, True])
def test_equal_linear(rng, fused):
    x = rng.standard_normal((3, 24), dtype=np.float32)
    m = EqualLinear(10, lr_mul=0.01,
                    activation="fused_lrelu" if fused else None)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    k = np.asarray(params["params"]["kernel"])
    b = np.asarray(params["params"]["bias"])
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    want = oracle.equal_linear(x, k, b, lr_mul=0.01, fused=fused)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pixel_norm(rng):
    x = rng.standard_normal((5, 12), dtype=np.float32)
    got = np.asarray(PixelNorm().apply({}, jnp.asarray(x)))
    want = x * (1.0 / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-8))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_group_norm_matches_torch(rng):
    x = rng.standard_normal((2, 8, 8, 64), dtype=np.float32)
    gamma = rng.standard_normal(64).astype(np.float32)
    beta = rng.standard_normal(64).astype(np.float32)
    m = GroupNorm()
    variables = {"params": {"scale": jnp.asarray(gamma),
                            "bias": jnp.asarray(beta)}}
    got = np.asarray(m.apply(variables, jnp.asarray(x)))
    want = oracle.group_norm_nhwc(x, gamma, beta, groups=2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_group_norm_masked_equals_cropped(rng):
    """Masked GN over a zero-padded window == GN over the valid crop."""
    L, W = 20, 32
    x = np.zeros((1, 8, W, 32), dtype=np.float32)
    valid = rng.standard_normal((1, 8, L, 32), dtype=np.float32)
    x[:, :, :L] = valid
    mask = (np.arange(W) < L).astype(np.float32).reshape(1, 1, W, 1)
    gamma = rng.standard_normal(32).astype(np.float32)
    beta = rng.standard_normal(32).astype(np.float32)
    variables = {"params": {"scale": jnp.asarray(gamma),
                            "bias": jnp.asarray(beta)}}
    got = np.asarray(GroupNorm().apply(variables, jnp.asarray(x),
                                       mask=jnp.asarray(mask)))
    want = oracle.group_norm_nhwc(valid, gamma, beta, groups=1)
    np.testing.assert_allclose(got[:, :, :L], want, rtol=1e-4, atol=1e-5)
    assert np.all(got[:, :, L:] == 0)


@pytest.mark.parametrize("demodulate,upsample", [(True, False), (False, False),
                                                 (True, True)])
def test_modulated_conv_matches_grouped_reference(rng, demodulate, upsample):
    """Activation-folded modulation == materialized per-sample weights."""
    B, H, W, CI, CO = 3, 6, 10, 8, 12
    x = rng.standard_normal((B, H, W, CI), dtype=np.float32)
    style = rng.standard_normal((B, 16), dtype=np.float32)
    m = ModulatedConv2d(CO, kernel_size=3, demodulate=demodulate,
                        upsample=upsample)
    params = m.init(jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(style))
    got = np.asarray(m.apply(params, jnp.asarray(x), jnp.asarray(style)))

    # Recompute the style vector the module produced, then compare against
    # the torch grouped-conv formulation with the same weights.
    weight = np.asarray(params["params"]["weight"])
    mk = np.asarray(params["params"]["modulation"]["kernel"])
    mb = np.asarray(params["params"]["modulation"]["bias"])
    s = oracle.equal_linear(style, mk, mb, lr_mul=1.0, fused=False)
    want = oracle.modulated_conv_grouped(x, weight, s, demodulate=demodulate,
                                         upsample=upsample)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_adain_matches_torch(rng):
    p = rng.standard_normal((2, 8, 16, 6), dtype=np.float32)
    q = rng.standard_normal((2, 8, 16, 6), dtype=np.float32)
    got = np.asarray(adaptive_instance_norm(jnp.asarray(p), jnp.asarray(q)))
    want = oracle.adain_nhwc(p, q)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_adain_masked_equals_cropped(rng):
    L, W = 12, 16
    p = np.zeros((1, 8, W, 6), dtype=np.float32)
    q = np.zeros((1, 8, W, 6), dtype=np.float32)
    pv = rng.standard_normal((1, 8, L, 6), dtype=np.float32)
    qv = rng.standard_normal((1, 8, L, 6), dtype=np.float32)
    p[:, :, :L], q[:, :, :L] = pv, qv
    mask = (np.arange(W) < L).astype(np.float32).reshape(1, 1, W, 1)
    got = np.asarray(adaptive_instance_norm(
        jnp.asarray(p), jnp.asarray(q),
        prior_mask=jnp.asarray(mask), lq_mask=jnp.asarray(mask)))
    want = oracle.adain_nhwc(pv, qv)
    np.testing.assert_allclose(got[:, :, :L], want, rtol=1e-4, atol=1e-5)


def test_snconv_matches_torch_eval(rng):
    x = rng.standard_normal((2, 8, 8, 6), dtype=np.float32)
    m = SNConv(10)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    k = np.asarray(variables["params"]["kernel"])
    b = np.asarray(variables["params"]["bias"])
    u = np.asarray(variables["spectral"]["u"])
    v = np.asarray(variables["spectral"]["v"])
    got = np.asarray(m.apply(variables, jnp.asarray(x)))
    want = oracle.spectral_norm_conv(x, k, b, u, v)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_snconv_power_iteration_converges(rng):
    """With update_stats, sigma approaches the true spectral norm."""
    x = rng.standard_normal((1, 4, 4, 6), dtype=np.float32)
    m = SNConv(10, update_stats=True)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    k = np.asarray(variables["params"]["kernel"])
    wmat = k.transpose(3, 2, 0, 1).reshape(10, -1)
    true_sigma = np.linalg.svd(wmat, compute_uv=False)[0]
    state = variables
    for _ in range(50):
        _, updates = m.apply(state, jnp.asarray(x), mutable=["spectral"])
        state = {"params": variables["params"], **updates}
    u = np.asarray(state["spectral"]["u"])
    v = np.asarray(state["spectral"]["v"])
    sigma = u @ wmat @ v
    np.testing.assert_allclose(sigma, true_sigma, rtol=1e-3)


class TestComposedUpsampleConv:
    def test_matches_upsample_then_conv(self, rng):
        from marconet_tpu.ops.resize import (conv3x3_after_upsample2x,
                                             upsample2x_bilinear)

        x = jnp.asarray(rng.standard_normal((2, 8, 12, 5)), jnp.float32)
        k3 = jnp.asarray(rng.standard_normal((3, 3, 5, 7)) * 0.2,
                         jnp.float32)
        ref = jax.lax.conv_general_dilated(
            upsample2x_bilinear(x), k3, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = conv3x3_after_upsample2x(x, k3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_snconv_pre_upsample(self, rng):
        from marconet_tpu.ops.layers import SNConv
        from marconet_tpu.ops.resize import upsample2x_bilinear

        x = jnp.asarray(rng.standard_normal((2, 8, 12, 6)), jnp.float32)
        plain = SNConv(4)
        fused = SNConv(4, pre_upsample=True)
        params = plain.init(jax.random.PRNGKey(0), upsample2x_bilinear(x))
        ref = plain.apply(params, upsample2x_bilinear(x))
        out = fused.apply(params, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)


class TestPhaseLayout:
    """ops/phase.py: the 2x2-subpixel phase layout must be an exact
    re-bracketing of the hi-res math (probe-driven tail redesign,
    BENCH_NOTES.md)."""

    def test_pack_unpack_roundtrip(self, rng):
        from marconet_tpu.ops.phase import phase_pack, phase_unpack

        y = jnp.asarray(rng.standard_normal((2, 12, 20, 5)), jnp.float32)
        np.testing.assert_array_equal(np.asarray(phase_unpack(phase_pack(y))),
                                      np.asarray(y))

    def test_phase_conv3x3_matches_hires(self, rng):
        from marconet_tpu.ops.phase import (phase_conv3x3, phase_pack,
                                            phase_unpack)

        y = jnp.asarray(rng.standard_normal((2, 12, 20, 8)), jnp.float32)
        k3 = jnp.asarray(rng.standard_normal((3, 3, 8, 12)) * 0.2,
                         jnp.float32)
        bias = jnp.asarray(rng.standard_normal(12), jnp.float32)
        ref = jax.lax.conv_general_dilated(
            y, k3, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
        got = phase_unpack(phase_conv3x3(phase_pack(y), k3, bias))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)

    @pytest.mark.parametrize("form", ["split4", "splitpad", "embed9"])
    def test_phase_conv3x3_forms_match(self, rng, monkeypatch, form):
        """The alternative formulations (4 x (2,2,4I,O) convs; one
        padded (2,2,4I,4O) conv + shifted slices; one (3,3,4I,4O) SAME
        conv with the split kernels embedded at phase offsets) must
        match the hi-res conv exactly like the dense 2-conv form does."""
        from marconet_tpu.ops.phase import (phase_conv3x3, phase_pack,
                                            phase_unpack)

        monkeypatch.setenv("MARCONET_PHASE_CONV", form)
        y = jnp.asarray(rng.standard_normal((2, 12, 20, 8)), jnp.float32)
        k3 = jnp.asarray(rng.standard_normal((3, 3, 8, 12)) * 0.2,
                         jnp.float32)
        bias = jnp.asarray(rng.standard_normal(12), jnp.float32)
        ref = jax.lax.conv_general_dilated(
            y, k3, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
        got = phase_unpack(phase_conv3x3(phase_pack(y), k3, bias))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)

    def test_upconv_phase_matches_separate_path(self, rng):
        from marconet_tpu.ops.phase import (conv3x3_after_upsample2x_phase,
                                            phase_unpack)
        from marconet_tpu.ops.resize import upsample2x_bilinear

        x = jnp.asarray(rng.standard_normal((2, 6, 10, 5)), jnp.float32)
        k3 = jnp.asarray(rng.standard_normal((3, 3, 5, 7)) * 0.2,
                         jnp.float32)
        ref = jax.lax.conv_general_dilated(
            upsample2x_bilinear(x), k3, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = phase_unpack(conv3x3_after_upsample2x_phase(x, k3))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)

    def test_phase_group_norm_matches_hires(self, rng):
        from marconet_tpu.ops.layers import group_norm
        from marconet_tpu.ops.phase import (phase_group_norm, phase_pack,
                                            phase_unpack)

        y = jnp.asarray(rng.standard_normal((2, 8, 12, 64)), jnp.float32)
        gamma = jnp.asarray(rng.standard_normal(64), jnp.float32)
        beta = jnp.asarray(rng.standard_normal(64), jnp.float32)
        ref = group_norm(y, gamma, beta, num_groups=2)
        got = phase_unpack(
            phase_group_norm(phase_pack(y), gamma, beta, num_groups=2))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4)

    def test_res_block_phase_matches_plain(self, rng):
        """Whole ResTextBlockV2 in phase mode (GN + SNConvs + conv_out
        skip projection) vs the plain hi-res path, same parameters."""
        from marconet_tpu.ops.layers import ResTextBlockV2
        from marconet_tpu.ops.phase import phase_pack, phase_unpack

        y = jnp.asarray(rng.standard_normal((2, 8, 12, 8)), jnp.float32)
        plain = ResTextBlockV2(12)
        phased = ResTextBlockV2(12, phase=True)
        params = plain.init(jax.random.PRNGKey(0), y)
        ref = plain.apply(params, y)
        got = phase_unpack(phased.apply(params, phase_pack(y)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4)

    def test_snconv_phase_modes_match(self, rng):
        from marconet_tpu.ops.layers import SNConv
        from marconet_tpu.ops.phase import phase_pack, phase_unpack
        from marconet_tpu.ops.resize import upsample2x_bilinear

        x = jnp.asarray(rng.standard_normal((2, 6, 10, 6)), jnp.float32)
        up = upsample2x_bilinear(x)
        plain = SNConv(4)
        params = plain.init(jax.random.PRNGKey(0), up)
        ref = plain.apply(params, up)
        got_in = phase_unpack(
            SNConv(4, phase_input=True).apply(params, phase_pack(up)))
        got_up = phase_unpack(
            SNConv(4, pre_upsample=True, phase_output=True).apply(params, x))
        np.testing.assert_allclose(np.asarray(got_in), np.asarray(ref),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_up), np.asarray(ref),
                                   atol=1e-5)


def test_modulated_conv_upsample_phase_path(rng, monkeypatch):
    """The >=32-row upsample branch (phase-layout fused upconv) must
    match the torch grouped-conv reference exactly like the small-input
    branch does. Forced on via env: the default resolves by backend and
    the CPU suite would otherwise take the plain path."""
    monkeypatch.setenv("MARCONET_PHASE_UPCONV", "1")
    B, H, W, CI, CO = 2, 32, 16, 8, 12
    x = rng.standard_normal((B, H, W, CI), dtype=np.float32)
    style = rng.standard_normal((B, 16), dtype=np.float32)
    m = ModulatedConv2d(CO, kernel_size=3, demodulate=True, upsample=True)
    params = m.init(jax.random.PRNGKey(1), jnp.asarray(x),
                    jnp.asarray(style))
    got = np.asarray(m.apply(params, jnp.asarray(x), jnp.asarray(style)))

    weight = np.asarray(params["params"]["weight"])
    mk = np.asarray(params["params"]["modulation"]["kernel"])
    mb = np.asarray(params["params"]["modulation"]["bias"])
    s = oracle.equal_linear(style, mk, mb, lr_mul=1.0, fused=False)
    want = oracle.modulated_conv_grouped(x, weight, s, demodulate=True,
                                         upsample=True)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


class TestChannelsMajorRGB:
    def test_upsample_cm_matches_nhwc(self, rng):
        from marconet_tpu.ops.resize import (upsample2x_bilinear,
                                             upsample2x_bilinear_cm)

        x = jnp.asarray(rng.standard_normal((2, 3, 12, 20)), jnp.float32)
        ref = upsample2x_bilinear(jnp.transpose(x, (0, 2, 3, 1)))
        got = jnp.transpose(upsample2x_bilinear_cm(x), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6)

    def test_torgb_channels_major_matches_plain(self, rng):
        from marconet_tpu.ops.modconv import ToRGB

        B, H, W, C = 2, 8, 8, 16
        x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        style = jnp.asarray(rng.standard_normal((B, 16)), jnp.float32)
        skip = jnp.asarray(rng.standard_normal((B, H // 2, W // 2, 3)),
                           jnp.float32)

        plain = ToRGB()
        cm = ToRGB(channels_major=True)
        params = plain.init(jax.random.PRNGKey(0), x, style, skip)
        ref = plain.apply(params, x, style, skip)
        got = cm.apply(params, x, style, jnp.transpose(skip, (0, 3, 1, 2)))
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(got, (0, 2, 3, 1))), np.asarray(ref),
            atol=1e-5)


class TestWidthFold:
    """Width-folded convs are exact re-bracketings of the hi-res convs
    (``ops/widthfold``; encoder early stages, reference
    ``models/resnet.py:9-29``)."""

    @pytest.mark.parametrize("f", [2, 4])
    @pytest.mark.parametrize("kw,stride", [((3, 3), (1, 1)),
                                           ((3, 3), (2, 1)),
                                           ((1, 1), (1, 1)),
                                           ((1, 1), (2, 1))])
    def test_wfold_conv_matches_hires(self, rng, f, kw, stride):
        from marconet_tpu.ops.widthfold import wfold, wfold_conv, wunfold

        B, H, W, CI, CO = 2, 8, 24, 5, 7
        x = jnp.asarray(rng.standard_normal((B, H, W, CI)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((*kw, CI, CO)) * 0.2,
                        jnp.float32)
        pad = ((kw[0] // 2,) * 2, (kw[1] // 2,) * 2)
        ref = jax.lax.conv_general_dilated(
            x, k, stride, pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = wunfold(wfold_conv(wfold(x, f), k, f, strides=stride), f)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_wfold_is_free_reshape(self, rng):
        from marconet_tpu.ops.widthfold import wfold, wunfold

        x = jnp.asarray(rng.standard_normal((1, 2, 8, 3)), jnp.float32)
        y = wfold(x, 4)
        # column 4j+q of channel c lands in channel block q
        np.testing.assert_array_equal(np.asarray(y[0, 1, 1, 3 * 2:3 * 3]),
                                      np.asarray(x[0, 1, 6]))
        np.testing.assert_array_equal(np.asarray(wunfold(y, 4)),
                                      np.asarray(x))

    def test_wfold_bias(self, rng):
        from marconet_tpu.ops.widthfold import wfold, wfold_conv, wunfold

        B, H, W, CI, CO = 1, 4, 16, 3, 4
        x = jnp.asarray(rng.standard_normal((B, H, W, CI)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, CI, CO)) * 0.2,
                        jnp.float32)
        bias = jnp.asarray(rng.standard_normal((CO,)), jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
        got = wunfold(wfold_conv(wfold(x, 4), k, 4, bias=bias), 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_phase_to_wfold_layout(self, rng):
        """phase-packed -> wfold-2 relayout: unfolding the result must
        reproduce the hi-res tensor the phases encode."""
        from marconet_tpu.ops.phase import phase_pack
        from marconet_tpu.ops.widthfold import phase_to_wfold, wunfold

        y = jnp.asarray(rng.standard_normal((2, 6, 10, 3)), jnp.float32)
        got = wunfold(phase_to_wfold(phase_pack(y)), 2)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(y))

    def test_upconv_wfold_matches_separate(self, rng):
        """conv3x3_after_upsample2x_wfold (one lhs-H-dilated conv, no
        relayout) == wfold of the exact separate upsample->conv path,
        INCLUDING the four 1-px hi-res borders."""
        from marconet_tpu.ops.resize import upsample2x_bilinear
        from marconet_tpu.ops.widthfold import (
            conv3x3_after_upsample2x_wfold, wfold)

        B, H, W, CI, CO = 2, 6, 10, 5, 3
        x = jnp.asarray(rng.standard_normal((B, H, W, CI)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, CI, CO)) * 0.2,
                        jnp.float32)
        ref = wfold(jax.lax.conv_general_dilated(
            upsample2x_bilinear(x), k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")), 2)
        got = conv3x3_after_upsample2x_wfold(x, k)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_wfold_group_norm_matches_hires(self, rng):
        """GroupNorm computed in wfold layout == hi-res GroupNorm."""
        from marconet_tpu.ops.layers import group_norm
        from marconet_tpu.ops.widthfold import (wfold, wfold_group_norm,
                                                wunfold)

        B, H, W, C, G = 2, 4, 12, 8, 2
        x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        gamma = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
        beta = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
        ref = group_norm(x, gamma, beta, G)
        got = wunfold(wfold_group_norm(wfold(x, 2), gamma, beta, G), 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_resnet_fold_matches_plain(self, rng):
        """Full folded ResNet stem+stages vs the plain path, same params."""
        from marconet_tpu.models.encoder import ResNet45

        x = jnp.asarray(rng.standard_normal((1, 16, 32, 3)), jnp.float32)
        plain = ResNet45(stage_blocks=(2, 2, 2),
                         stage_features=(8, 16, 32),
                         stage_strides=((2, 1), (1, 1), (2, 1)))
        folded = ResNet45(stage_blocks=(2, 2, 2),
                          stage_features=(8, 16, 32),
                          stage_strides=((2, 1), (1, 1), (2, 1)), fold=4)
        params = plain.init(jax.random.PRNGKey(0), x)
        params2 = folded.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(params) == \
            jax.tree_util.tree_structure(params2)
        ref = plain.apply(params, x)
        got = folded.apply(params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


class TestPallasConv:
    """Implicit-GEMM Pallas conv3x3 (ops/pallas_conv.py) vs the XLA conv
    it may replace in the SFT stacks — exactness in interpreter mode."""

    @pytest.mark.parametrize("shape", [(2, 8, 8, 256, 128),
                                       (1, 8, 16, 512, 256)])
    def test_matches_xla_conv(self, rng, shape):
        from marconet_tpu.ops.pallas_conv import conv3x3_same

        n, h, w, ci, co = shape
        x = jnp.asarray(rng.standard_normal((n, h, w, ci)) * 0.3,
                        jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.05,
                        jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = conv3x3_same(x, k, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
