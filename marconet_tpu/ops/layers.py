"""Core numerical layers (flax.linen, NHWC, channels-last).

TPU-first re-designs of the reference building blocks:

- ``EqualLinear``  — StyleGAN equalized linear (reference
  ``models/networks.py:173-198``): runtime weight gain ``lr_mul/sqrt(fan_in)``
  and bias gain ``lr_mul``, optional fused-LeakyReLU epilogue.
- ``PixelNorm``    — reference ``models/networks.py:166-171``.
- ``group_norm`` / ``GroupNorm`` — torch ``nn.GroupNorm`` semantics
  (32 channels/group, eps=1e-6; reference ``models/networks.py:487-490``),
  extended with an optional validity mask so the per-character SFT windows
  can be normalized over their valid columns only (the reference gets this
  implicitly by slicing dynamic-width windows; we keep static shapes and
  mask instead).
- ``SNConv``       — spectrally-normalized conv with torch
  ``nn.utils.spectral_norm`` semantics (power-iteration state ``u``/``v``;
  used throughout the SR net, reference ``models/networks.py:335-409``).
- ``ResTextBlockV2`` — GN/swish residual block (reference
  ``models/networks.py:495-516``).
- ``adaptive_instance_norm`` — AdaIN with *unbiased* variance + eps=1e-5,
  matching ``calc_mean_std_4D`` (reference ``models/networks.py:518-533``),
  with optional column-validity mask.

All modules take ``dtype`` for the compute precision (params stay float32).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from marconet_tpu.ops.fused_act import fused_leaky_relu

Dtype = Any


def leaky_relu(x, negative_slope: float = 0.2):
    return jnp.where(x >= 0, x, x * negative_slope)


def swish(x):
    return x * jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# StyleGAN-style equalized linear
# ---------------------------------------------------------------------------


class EqualLinear(nn.Module):
    """Equalized linear layer.

    ``y = x @ (kernel * lr_mul / sqrt(fan_in)) + bias * lr_mul``; with
    ``activation='fused_lrelu'`` the bias is applied inside the fused
    LeakyReLU epilogue instead.
    """

    features: int
    use_bias: bool = True
    bias_init_val: float = 0.0
    lr_mul: float = 1.0
    activation: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        # Stored kernel matches torch's randn()/lr_mul initialization.
        kernel = self.param(
            "kernel",
            lambda key, shape: jax.random.normal(key, shape) / self.lr_mul,
            (in_features, self.features),
        )
        scale = (1.0 / jnp.sqrt(in_features)) * self.lr_mul
        w = (kernel * scale).astype(self.dtype)
        y = jnp.dot(x.astype(self.dtype), w)
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda key, shape: jnp.full(shape, self.bias_init_val,
                                            jnp.float32),
                (self.features,),
            ) * self.lr_mul
        if self.activation == "fused_lrelu":
            y = fused_leaky_relu(y, bias.astype(self.dtype))
        elif bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class PixelNorm(nn.Module):
    """x * rsqrt(mean(x^2, channel) + 1e-8), channels-last."""

    @nn.compact
    def __call__(self, x):
        return x * jax.lax.rsqrt(
            jnp.mean(jnp.square(x), axis=-1, keepdims=True) + 1e-8)


# ---------------------------------------------------------------------------
# Group normalization with optional validity mask
# ---------------------------------------------------------------------------


def group_norm(x, gamma, beta, num_groups: int, eps: float = 1e-6,
               mask=None):
    """GroupNorm over an NHWC tensor (torch semantics, biased variance).

    Args:
      x: (B, H, W, C).
      gamma, beta: (C,) affine parameters.
      num_groups: number of channel groups.
      mask: optional broadcastable validity mask (e.g. (B, 1, W, 1)); when
        given, statistics are computed over valid positions only and the
        output is zeroed at invalid positions.
    """
    b, h, w, c = x.shape
    g = num_groups
    xg = x.reshape(b, h, w, g, c // g)
    f32 = xg.astype(jnp.float32)
    # single-pass moments (one read of the activations instead of two
    # dependent reduction passes; f32 accumulation)
    if mask is None:
        mean = f32.mean(axis=(1, 2, 4), keepdims=True)
        ex2 = jnp.square(f32).mean(axis=(1, 2, 4), keepdims=True)
        var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
    else:
        # mask broadcastable to (B, H|1, W, 1); never materialize the
        # full-size broadcast — multiply lazily and count analytically
        mf = mask.astype(jnp.float32)
        m5 = mf[..., None]                       # (B, H|1, W, 1, 1)
        cnt = mf.sum(axis=(1, 2, 3)).reshape(b, 1, 1, 1, 1)
        if mask.shape[1] == 1:
            cnt = cnt * h
        cnt = jnp.maximum(cnt * (c // g), 1.0)
        fm = f32 * m5
        mean = fm.sum(axis=(1, 2, 4), keepdims=True) / cnt
        ex2 = (f32 * fm).sum(axis=(1, 2, 4), keepdims=True) / cnt
        var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
    y = (f32 - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, h, w, c).astype(x.dtype)
    y = y * gamma.astype(x.dtype) + beta.astype(x.dtype)
    if mask is not None:
        y = y * mask.astype(y.dtype)
    return y


class GroupNorm(nn.Module):
    """32-channels-per-group GroupNorm (reference ``GroupNorm`` helper)."""

    channels_per_group: int = 32
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, mask=None, params_only=False):
        c = x.shape[-1]
        # width-reduced configs (dryrun/CI) may have fewer channels than a
        # full group; fall back to one group then (full-size models always
        # satisfy c % 32 == 0, so their numerics are unchanged)
        cpg = min(self.channels_per_group, c)
        assert c % cpg == 0
        gamma = self.param("scale", nn.initializers.ones, (c,))
        beta = self.param("bias", nn.initializers.zeros, (c,))
        if params_only:
            # phase-layout callers apply the normalization themselves but
            # must still own the affine parameters (x is a shape donor)
            return gamma, beta
        return group_norm(x, gamma, beta, c // cpg, self.eps, mask=mask)


# ---------------------------------------------------------------------------
# Spectral-norm conv
# ---------------------------------------------------------------------------


def _l2_normalize(v, eps=1e-12):
    return v / jnp.maximum(jnp.linalg.norm(v), eps)


class SNConv(nn.Module):
    """Conv2D with spectral weight normalization (torch semantics).

    State: power-iteration vectors ``u`` (out_features,) and ``v``
    (fan_in,), kept in the ``spectral`` variable collection. With
    ``update_stats=True`` one power iteration is run and the vectors are
    updated (training); otherwise the stored vectors are used as-is (eval),
    matching torch's train/eval behaviour.

    The sigma matvec is done on the torch-layout (O, I*kh*kw) view of the
    kernel so converted checkpoints reproduce torch numerics exactly.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Union[str, Sequence[Tuple[int, int]]] = ((1, 1), (1, 1))
    use_bias: bool = True
    update_stats: bool = False
    # fold a preceding x2 bilinear upsample into this conv (exact; one
    # dense input-dilated conv instead of the bandwidth-bound depthwise
    # upsample + conv — see ops/resize.conv3x3_after_upsample2x)
    pre_upsample: bool = False
    # phase-separated (2x2 subpixel) layout (ops/phase.py): with
    # phase_input the hi-res 3x3 conv consumes/produces (B,H,W,4C)
    # phase-packed tensors; with pre_upsample + phase_output the fused
    # upsample-conv emits phase-packed output. Parameter shapes are
    # identical to the plain path (phase kernels are derived at trace
    # time), so converted checkpoints are unaffected.
    phase_input: bool = False
    phase_output: bool = False
    # width-folded (ops/widthfold) layout: consume/produce (B, H, W/2,
    # 2C) tensors — the hi-res conv runs as ONE folded conv with a
    # trace-time-derived kernel. Parameter shapes unchanged. With
    # pre_upsample + wfold_output the fused upsample-conv emits the
    # folded hi-res canvas DIRECTLY (one lhs-H-dilated conv — no
    # phase->wfold relayout transpose; ops/widthfold).
    wfold_input: bool = False
    wfold_output: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, kernels_only: bool = False):
        in_features = x.shape[-1]
        if self.phase_input:
            in_features = x.shape[-1] // 4
        elif self.wfold_input:
            in_features = x.shape[-1] // 2
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, in_features, self.features),
        )
        # torch layout: (O, I, kh, kw) flattened to (O, I*kh*kw)
        w_mat = jnp.transpose(kernel, (3, 2, 0, 1)).reshape(self.features, -1)

        def init_u():
            # Unlike torch (whose first training forward aligns random
            # u/v via power iteration), we align at init so sigma starts
            # at ~sigma_max even for never-trained random weights.
            u = _l2_normalize(jax.random.normal(
                self.make_rng("params") if self.has_rng("params")
                else jax.random.PRNGKey(0), (self.features,)))
            # fori_loop (not an unrolled python loop): keeps the init
            # graph small — at 15 unrolled matvecs per SNConv the 5-net
            # trainer init compiles ~2x slower on XLA:CPU
            u = jax.lax.fori_loop(
                0, 15,
                lambda _, uu: _l2_normalize(
                    w_mat @ _l2_normalize(w_mat.T @ uu)), u)
            return jax.lax.stop_gradient(u)

        u_var = self.variable("spectral", "u", init_u)
        v_var = self.variable(
            "spectral", "v",
            lambda: jax.lax.stop_gradient(
                _l2_normalize(w_mat.T @ u_var.value)))
        u, v = u_var.value, v_var.value
        if self.update_stats:
            v = _l2_normalize(w_mat.T @ u)
            u = _l2_normalize(w_mat @ v)
            u = jax.lax.stop_gradient(u)
            v = jax.lax.stop_gradient(v)
            u_var.value = u
            v_var.value = v
        sigma = jnp.dot(u, w_mat @ v)
        w = (kernel / sigma).astype(self.dtype)

        if kernels_only:
            # return the normalized kernel + bias without applying the
            # conv — lets callers concatenate kernels of sibling SNConvs
            # that read the same input into ONE wider conv (exact: a conv
            # distributes over output-channel concatenation). `x` is used
            # for its channel count only.
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,)).astype(self.dtype) \
                if self.use_bias else None
            return w, bias

        if self.pre_upsample:
            assert self.kernel_size == (3, 3) and self.strides == (1, 1)
            if self.phase_output:
                from marconet_tpu.ops.phase import \
                    conv3x3_after_upsample2x_phase
                y = conv3x3_after_upsample2x_phase(x.astype(self.dtype), w)
            elif self.wfold_output:
                from marconet_tpu.ops.widthfold import \
                    conv3x3_after_upsample2x_wfold
                y = conv3x3_after_upsample2x_wfold(x.astype(self.dtype), w)
            else:
                from marconet_tpu.ops.resize import conv3x3_after_upsample2x
                y = conv3x3_after_upsample2x(x.astype(self.dtype), w)
        elif self.phase_input:
            assert self.kernel_size == (3, 3) and self.strides == (1, 1)
            from marconet_tpu.ops.phase import phase_conv3x3
            y = phase_conv3x3(x.astype(self.dtype), w)
        elif self.wfold_input:
            assert self.kernel_size == (3, 3) and self.strides == (1, 1)
            from marconet_tpu.ops.widthfold import wfold_conv
            y = wfold_conv(x.astype(self.dtype), w, 2)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), w,
                window_strides=self.strides,
                padding=self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            bias = bias.astype(self.dtype)
            if self.phase_input or (self.pre_upsample and self.phase_output):
                bias = jnp.tile(bias, 4)  # one copy per subpixel phase
            elif self.wfold_input or (self.pre_upsample
                                      and self.wfold_output):
                bias = jnp.tile(bias, 2)  # one copy per column phase
            y = y + bias
        return y


class Conv(nn.Module):
    """Plain conv wrapper with explicit NHWC/HWIO layout (no flax magic)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Union[str, Sequence[Tuple[int, int]]] = ((1, 1), (1, 1))
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, kernels_only: bool = False):
        in_features = x.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, in_features, self.features))
        if kernels_only:
            # (kernel, bias) without applying the conv — for callers that
            # re-bracket the conv into per-sample-scaled matmuls (the
            # folded SFT skip path); `x` donates the channel count only
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,)) if self.use_bias else None
            return kernel, bias
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=self.strides,
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


# ---------------------------------------------------------------------------
# Residual GN/swish block
# ---------------------------------------------------------------------------


class ResTextBlockV2(nn.Module):
    """GroupNorm -> swish -> SNConv3x3 (x2) residual block.

    The skip projection (``conv_out``) is a *plain* 1x1 conv — the reference
    wraps only conv1/conv2 in spectral norm (``models/networks.py:501-505``).
    Supports a column-validity ``mask`` for windowed (SFT) use.
    """

    features: int
    update_stats: bool = False
    # consume/produce phase-packed (B,H,W,4C) tensors (ops/phase.py);
    # same parameter tree as the plain path — GroupNorm stats pool the
    # four phase copies, convs run as phase-layout kernels
    phase: bool = False
    # consume/produce width-folded (B,H,W/2,2C) tensors (ops/widthfold);
    # the 1-D sibling of ``phase`` — same parameter tree
    wfold: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_in, mask=None, fold=None):
        if fold is not None:
            return self._folded(fold, mask)
        if self.phase:
            assert mask is None, "phase mode has no windowed-mask use"
            return self._phase(x_in)
        if self.wfold:
            assert mask is None, "wfold mode has no windowed-mask use"
            return self._wfold(x_in)
        in_features = x_in.shape[-1]
        x = GroupNorm(name="norm1")(x_in, mask=mask)
        x = swish(x)
        x = SNConv(self.features, update_stats=self.update_stats,
                   dtype=self.dtype, name="conv1")(x)
        if mask is not None:
            x = x * mask.astype(x.dtype)
        x = GroupNorm(name="norm2")(x, mask=mask)
        x = swish(x)
        x = SNConv(self.features, update_stats=self.update_stats,
                   dtype=self.dtype, name="conv2")(x)
        if mask is not None:
            x = x * mask.astype(x.dtype)
        if in_features != self.features:
            x_in = Conv(self.features, kernel_size=(1, 1), padding="VALID",
                        dtype=self.dtype, name="conv_out")(x_in)
            if mask is not None:
                x_in = x_in * mask.astype(x_in.dtype)
        return x + x_in

    def _folded(self, fold, mask):
        """AdaIN + norm1 collapsed into one per-channel affine (SFT fold).

        The SFT fuse block's input is ``concat([adain(z, lq), lq])``;
        AdaIN is a per-(sample, channel) affine of the raw prior windows
        ``z``, and norm1's group statistics of that affine are exactly
        derivable from the per-channel moments AdaIN already needs. So
        the caller passes the raw windows plus the analytic moments and
        this path applies ONE fused affine+swish pass — never
        materializing the AdaIN output or re-reading the concat for
        norm1's statistics. conv1/norm2/conv2 run unchanged; the
        ``conv_out`` skip is re-bracketed into per-sample-scaled
        matmuls on the raw inputs. Exact up to float reassociation
        (pinned in tests/test_models.py::TestSFTFold).

        fold keys: ``z``/``lq`` (BN, H, win, C) masked raw windows,
        ``a``/``b`` (BN, C) f32 AdaIN affine, ``mu``/``e2`` (BN, 2C)
        f32 per-channel valid-position mean / second moment of the
        concat input.
        """
        z, lq = fold["z"], fold["lq"]
        bn, h, win, cf = z.shape
        c2 = 2 * cf
        donor = jnp.zeros((1, 1, 1, c2), z.dtype)
        gamma1, beta1 = GroupNorm(name="norm1")(donor, params_only=True)
        cpg = min(32, c2)
        g = c2 // cpg
        mu, e2 = fold["mu"], fold["e2"]
        m_g = mu.reshape(bn, g, cpg).mean(-1)
        e2_g = e2.reshape(bn, g, cpg).mean(-1)
        var_g = jnp.maximum(e2_g - jnp.square(m_g), 0.0)
        r_g = jax.lax.rsqrt(var_g + 1e-6)  # GroupNorm default eps
        r_c = jnp.repeat(r_g, cpg, axis=1)           # (BN, 2C)
        m_c = jnp.repeat(m_g, cpg, axis=1)
        a_in = jnp.concatenate([fold["a"], jnp.ones_like(fold["a"])], -1)
        b_in = jnp.concatenate([fold["b"], jnp.zeros_like(fold["b"])], -1)
        g32 = gamma1.astype(jnp.float32)[None]
        aff_a = a_in * r_c * g32
        aff_b = (b_in - m_c) * r_c * g32 + beta1.astype(jnp.float32)[None]

        cat = jnp.concatenate([z, lq], axis=-1)
        y = cat.astype(jnp.float32) * aff_a[:, None, None, :] \
            + aff_b[:, None, None, :]
        y = swish(y).astype(z.dtype)
        if mask is not None:
            y = y * mask.astype(y.dtype)

        x = SNConv(self.features, update_stats=self.update_stats,
                   dtype=self.dtype, name="conv1")(y)
        if mask is not None:
            x = x * mask.astype(x.dtype)
        x = GroupNorm(name="norm2")(x, mask=mask)
        x = swish(x)
        x = SNConv(self.features, update_stats=self.update_stats,
                   dtype=self.dtype, name="conv2")(x)
        if mask is not None:
            x = x * mask.astype(x.dtype)

        # skip = conv_out(concat([a*z + b, lq])) without materializing
        # the AdaIN output: fold `a` into a per-sample weight, `b` into
        # a per-sample bias
        kernel, bias0 = Conv(self.features, kernel_size=(1, 1),
                             padding="VALID", dtype=self.dtype,
                             name="conv_out")(donor, kernels_only=True)
        w_a = kernel[0, 0, :cf].astype(jnp.float32)   # (C, F)
        w_l = kernel[0, 0, cf:].astype(self.dtype)
        wa_b = (fold["a"][:, :, None] * w_a[None]).astype(self.dtype)
        skip = jnp.einsum("bhwc,bco->bhwo", z.astype(self.dtype), wa_b,
                          preferred_element_type=self.dtype)
        skip = skip + jnp.einsum("bhwc,co->bhwo", lq.astype(self.dtype),
                                 w_l, preferred_element_type=self.dtype)
        const = fold["b"] @ w_a                        # (BN, F)
        if bias0 is not None:
            const = const + bias0.astype(jnp.float32)[None]
        skip = skip + const.astype(skip.dtype)[:, None, None, :]
        if mask is not None:
            skip = skip * mask.astype(skip.dtype)
        return x + skip

    def _wfold(self, x_in):
        """Width-folded variant: identical math and parameter tree to the
        plain path, computed with hi-res columns folded into channels
        (``ops/widthfold``; fold factor 2)."""
        from marconet_tpu.ops.widthfold import wfold_group_norm

        c_in = x_in.shape[-1] // 2

        def gn(name, v, c):
            donor = jnp.zeros((1, 1, 1, c), v.dtype)
            gamma, beta = GroupNorm(name=name)(donor, params_only=True)
            return wfold_group_norm(v, gamma, beta, c // min(32, c))

        x = swish(gn("norm1", x_in, c_in))
        x = SNConv(self.features, update_stats=self.update_stats,
                   wfold_input=True, dtype=self.dtype, name="conv1")(x)
        x = swish(gn("norm2", x, self.features))
        x = SNConv(self.features, update_stats=self.update_stats,
                   wfold_input=True, dtype=self.dtype, name="conv2")(x)
        skip = x_in
        if c_in != self.features:
            # hi-res 1x1 conv = per-column-phase channel matmul
            b, h, w, _ = x_in.shape
            skip = Conv(self.features, kernel_size=(1, 1), padding="VALID",
                        dtype=self.dtype, name="conv_out")(
                x_in.reshape(b, h, w * 2, c_in)).reshape(
                b, h, w, 2 * self.features)
        return x + skip

    def _phase(self, x_in):
        """Phase-layout variant: identical math and parameter tree to the
        plain path, computed on the half-res grid with the 2x2 subpixel
        phases packed into channels (``ops/phase.py``)."""
        from marconet_tpu.ops.phase import phase_group_norm

        c_in = x_in.shape[-1] // 4

        def gn(name, v, c):
            donor = jnp.zeros((1, 1, 1, c), v.dtype)
            gamma, beta = GroupNorm(name=name)(donor, params_only=True)
            return phase_group_norm(v, gamma, beta, c // min(32, c))

        x = swish(gn("norm1", x_in, c_in))
        x = SNConv(self.features, update_stats=self.update_stats,
                   phase_input=True, dtype=self.dtype, name="conv1")(x)
        x = swish(gn("norm2", x, self.features))
        x = SNConv(self.features, update_stats=self.update_stats,
                   phase_input=True, dtype=self.dtype, name="conv2")(x)
        skip = x_in
        if c_in != self.features:
            # hi-res 1x1 conv = per-phase-block channel matmul
            b, h, w, _ = x_in.shape
            skip = Conv(self.features, kernel_size=(1, 1), padding="VALID",
                        dtype=self.dtype, name="conv_out")(
                x_in.reshape(b, h, w * 4, c_in)).reshape(
                b, h, w, 4 * self.features)
        return x + skip


# ---------------------------------------------------------------------------
# AdaIN
# ---------------------------------------------------------------------------


def masked_mean_std(x, mask=None, eps: float = 1e-5):
    """Per-(batch, channel) mean/std of an NHWC tensor.

    Matches ``calc_mean_std_4D`` (reference ``models/networks.py:518-525``):
    *unbiased* variance (N-1 denominator) with eps added to the variance
    before sqrt. ``mask`` (broadcastable to (B, H, W, 1)) restricts the
    statistics to valid positions.
    """
    f32 = x.astype(jnp.float32)
    # single-pass moments; unbiased variance (N-1) as in the reference
    if mask is None:
        n = jnp.asarray(float(x.shape[1] * x.shape[2]), jnp.float32)
        mean = f32.mean(axis=(1, 2), keepdims=True)
        ex2 = jnp.square(f32).mean(axis=(1, 2), keepdims=True)
    else:
        # mask broadcastable to (B, H|1, W, 1); count analytically
        # instead of reducing a materialized broadcast
        m = mask.astype(jnp.float32)
        n = m.sum(axis=(1, 2), keepdims=True)
        if mask.shape[1] == 1:
            n = n * x.shape[1]
        n = jnp.maximum(n, 1.0)
        fm = f32 * m
        mean = fm.sum(axis=(1, 2), keepdims=True) / n
        ex2 = (f32 * fm).sum(axis=(1, 2), keepdims=True) / n
    var = jnp.maximum(ex2 - jnp.square(mean), 0.0) * \
        (n / jnp.maximum(n - 1.0, 1.0))
    std = jnp.sqrt(var + eps)
    return mean.astype(x.dtype), std.astype(x.dtype)


def adaptive_instance_norm(prior_feat, lq_feat, prior_mask=None,
                           lq_mask=None):
    """AdaIN: renormalize prior features to the LQ feature statistics.

    Reference ``adaptive_instance_normalization`` (``models/networks.py:
    528-533``). Masks restrict statistics to valid window columns.
    """
    lq_mean, lq_std = masked_mean_std(lq_feat, lq_mask)
    p_mean, p_std = masked_mean_std(prior_feat, prior_mask)
    out = (prior_feat - p_mean) / p_std * lq_std + lq_mean
    if prior_mask is not None:
        out = out * prior_mask.astype(out.dtype)
    return out
