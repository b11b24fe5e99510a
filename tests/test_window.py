"""Custom-VJP window ops: forward identity + grad parity vs the plain
autodiff formulations (``ops/window.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marconet_tpu.ops.window import (gather_windows, gather_windows_per_slot,
                                     resample2tap)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def _plain_gather(canvas, starts, win):
    def one(c, s):
        return jax.lax.dynamic_slice_in_dim(c, s, win, axis=1)

    return jax.vmap(jax.vmap(one, in_axes=(None, 0)),
                    in_axes=(0, 0))(canvas, starts)


def _plain_per_slot(t, starts, win):
    def one(p, s):
        return jax.lax.dynamic_slice_in_dim(p, s, win, axis=1)

    return jax.vmap(jax.vmap(one))(t, starts)


def _plain_resample(img, idx, w0):
    wmax = img.shape[2]

    def per_sample(im, ix, w):
        a = jnp.take(im, ix, axis=1)
        b = jnp.take(im, jnp.minimum(ix + 1, wmax - 1), axis=1)
        out = a * w[None, :, :, None] + b * (1.0 - w[None, :, :, None])
        return out.transpose(1, 0, 2, 3)

    return jax.vmap(per_sample)(img, idx, w0)


def test_gather_windows_grad_parity(rng):
    B, H, Wp, C, N, win = 2, 4, 20, 3, 3, 6
    canvas = jnp.asarray(rng.standard_normal((B, H, Wp, C)), jnp.float32)
    # include overlapping and edge-adjacent windows
    starts = jnp.asarray([[0, 3, Wp - win], [5, 5, 1]], jnp.int32)
    ct = jnp.asarray(rng.standard_normal((B, N, H, win, C)), jnp.float32)

    out = gather_windows(canvas, starts, win)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(_plain_gather(canvas, starts, win)))

    g_custom = jax.grad(
        lambda cv: (gather_windows(cv, starts, win) * ct).sum())(canvas)
    g_plain = jax.grad(
        lambda cv: (_plain_gather(cv, starts, win) * ct).sum())(canvas)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_plain),
                               rtol=1e-6, atol=1e-6)


def test_gather_per_slot_grad_parity(rng):
    B, N, H, Wp, C, win = 2, 3, 4, 16, 3, 6
    t = jnp.asarray(rng.standard_normal((B, N, H, Wp, C)), jnp.float32)
    starts = jnp.asarray(rng.integers(0, Wp - win, (B, N)), jnp.int32)
    ct = jnp.asarray(rng.standard_normal((B, N, H, win, C)), jnp.float32)

    out = gather_windows_per_slot(t, starts, win)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(_plain_per_slot(t, starts, win)))

    g_custom = jax.grad(
        lambda v: (gather_windows_per_slot(v, starts, win) * ct).sum())(t)
    g_plain = jax.grad(
        lambda v: (_plain_per_slot(v, starts, win) * ct).sum())(t)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_plain),
                               rtol=1e-6, atol=1e-6)


def test_resample2tap_grad_parity(rng):
    B, H, W, C, N, K = 2, 4, 32, 3, 3, 8
    img = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    idx = np.asarray(rng.integers(0, W - 1, (B, N, K)), np.int32)
    idx[0, 0, 0] = W - 1  # exercise the clamped second tap
    idx = jnp.asarray(idx)
    w0 = jnp.asarray(rng.uniform(0, 1, (B, N, K)), jnp.float32)
    ct = jnp.asarray(rng.standard_normal((B, N, H, K, C)), jnp.float32)

    out = resample2tap(img, idx, w0)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_plain_resample(img, idx, w0)),
        rtol=1e-6, atol=1e-6)

    g_custom = jax.grad(
        lambda im: (resample2tap(im, idx, w0) * ct).sum())(img)
    g_plain = jax.grad(
        lambda im: (_plain_resample(im, idx, w0) * ct).sum())(img)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_plain),
                               rtol=1e-6, atol=1e-6)


def test_gather_windows_grad_under_jit_and_vmapless_shapes(rng):
    # jit + bf16 path (the shapes the SFT fusion actually runs)
    B, H, Wp, C, N, win = 2, 4, 24, 8, 2, 8
    canvas = jnp.asarray(rng.standard_normal((B, H, Wp, C)), jnp.bfloat16)
    starts = jnp.asarray([[0, 8], [4, 16]], jnp.int32)
    ct = jnp.asarray(rng.standard_normal((B, N, H, win, C)), jnp.bfloat16)

    @jax.jit
    def g(cv):
        return jax.grad(lambda v: (gather_windows(v, starts, win) *
                                   ct).astype(jnp.float32).sum())(cv)

    out = g(canvas)
    ref = jax.grad(lambda v: (_plain_gather(v, starts, win) *
                              ct).astype(jnp.float32).sum())(canvas)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)
