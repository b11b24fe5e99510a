"""Window gather/resample ops with MXU-friendly custom VJPs.

The SFT fusion and the training-loop char crops gather fixed-width
windows with batched ``dynamic_slice`` / ``take`` — the right *forward*
formulation on TPU (measured at parity with one-hot matmul gathers,
BENCH_NOTES.md). Their autodiff transposes are the problem: JAX
transposes a vmap'd ``dynamic_slice`` into per-slot
``dynamic_update_slice`` adds — N sequential full-canvas read+write
passes — and ``take`` into an XLA scatter, both movement-bound on TPU.
Round-3 training bench: the G-phase backward was 182 ms of a 239 ms
step at batch 2, dominated by exactly these transposes.

Here each gather keeps its fast forward and gets a hand-written VJP
whose scatter-add is a one-hot selection matmul on the MXU (the same
trick the SFT write-back uses forward, ``models/srnet.py``): overlap
adds become a (W x N*win) x (N*win x H*C) contraction — one batched
matmul instead of N serialized canvas passes.

Reference cost centers these replace: the per-character window loops of
``models/networks.py:411-485`` and the crop/resize loop of
``Train/tspgan/models/tspgan_model.py:524-546``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# batch-level window gather (one start per (batch, slot), shared canvas)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_windows(canvas, starts, win: int):
    """canvas (B, H, Wp, C), starts (B, N) int32 -> (B, N, H, win, C).

    Forward: vmap'd ``dynamic_slice`` (XLA's batched dynamic-slice is at
    parity with every matmul formulation probed, BENCH_NOTES.md).
    Backward: one-hot scatter-add matmul over the canvas width.
    """
    return _gather_windows_fwd_only(canvas, starts, win)


def _gather_windows_fwd_only(canvas, starts, win: int):
    def one(c, s):  # c: (H, Wp, C), s: scalar
        return jax.lax.dynamic_slice_in_dim(c, s, win, axis=1)

    return jax.vmap(  # over batch
        jax.vmap(one, in_axes=(None, 0)), in_axes=(0, 0))(canvas, starts)


def _gather_windows_fwd(canvas, starts, win: int):
    # canvas[:, :0] is a zero-element placeholder carrying the canvas
    # shape/dtype through the residuals (residuals must be JAX types)
    return _gather_windows_fwd_only(canvas, starts, win), \
        (starts, canvas[:, :0])


def _gather_windows_bwd(win: int, res, ct):
    starts, ph = res
    b, _, wp, c = ph.shape
    h = ct.shape[2]
    cdtype = ph.dtype
    n = starts.shape[1]
    # one-hot cover matrix (B, Wp, N*win): canvas column x receives
    # window column v of slot n iff x == starts[b, n] + v. Overlapping
    # windows ADD (the transpose of a read is an accumulation).
    xcols = jnp.arange(wp, dtype=starts.dtype)
    rel = xcols[None, :, None] - starts[:, None, :]            # (B, Wp, N)
    sel = (rel[..., None] ==
           jnp.arange(win, dtype=starts.dtype)[None, None, None, :])
    sel = sel.reshape(b, wp, n * win)
    # ct (B, N, H, win, C) -> (B, N*win, H*C); f32 accumulation, cast back
    ctf = ct.transpose(0, 1, 3, 2, 4).reshape(b, n * win, h * c)
    d = jnp.einsum("bwk,bkf->bwf", sel.astype(ctf.dtype), ctf,
                   preferred_element_type=jnp.float32)
    d = d.reshape(b, wp, h, c).transpose(0, 2, 1, 3).astype(cdtype)
    return d, None


gather_windows.defvjp(_gather_windows_fwd, _gather_windows_bwd)


# ---------------------------------------------------------------------------
# per-slot window gather (each slot slices its own tensor)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_windows_per_slot(t, starts, win: int):
    """t (B, N, H, Wp, C), starts (B, N) int32 -> (B, N, H, win, C).

    Per-slot variant (the SFT prior crop): slot n slices its own plane.
    Backward is a per-slot one-hot matmul — batched over (B, N), a
    (Wp x win) x (win x H*C) contraction per slot.
    """
    return _per_slot_fwd_only(t, starts, win)


def _per_slot_fwd_only(t, starts, win: int):
    def one(p, s):  # p: (H, Wp, C)
        return jax.lax.dynamic_slice_in_dim(p, s, win, axis=1)

    return jax.vmap(jax.vmap(one))(t, starts)


def _per_slot_fwd(t, starts, win: int):
    return _per_slot_fwd_only(t, starts, win), (starts, t[:, :, :0])


def _per_slot_bwd(win: int, res, ct):
    starts, ph = res
    b, n, _, wp, c = ph.shape
    h = ct.shape[2]
    tdtype = ph.dtype
    ycols = jnp.arange(wp, dtype=starts.dtype)
    rel = ycols[None, None, :, None] - starts[:, :, None, None]
    sel = (rel == jnp.arange(win, dtype=starts.dtype)[None, None, None, :])
    # (B, N, Wp, win) x (B, N, win, H*C) -> (B, N, Wp, H*C)
    ctf = ct.transpose(0, 1, 3, 2, 4).reshape(b, n, win, h * c)
    d = jnp.einsum("bnyv,bnvf->bnyf", sel.astype(ctf.dtype), ctf,
                   preferred_element_type=jnp.float32)
    d = d.reshape(b, n, wp, h, c).transpose(0, 1, 3, 2, 4).astype(tdtype)
    return d, None


gather_windows_per_slot.defvjp(_per_slot_fwd, _per_slot_bwd)


# ---------------------------------------------------------------------------
# 2-tap width resample (training char crops)
# ---------------------------------------------------------------------------


@jax.custom_vjp
def resample2tap(img, idx, w0):
    """img (B, H, W, C), idx/w0 (B, N, K) -> (B, N, H, K, C).

    out[b,n,h,k] = w0 * img[b,h,idx] + (1-w0) * img[b,h,idx+1] (clamped)
    — the fixed-shape crop-and-resize of the training char crops
    (``train_step.crop_chars``). Forward: batched ``take``. Backward:
    the 2-tap weights folded into one one-hot scatter-add matmul over
    the image width (instead of XLA scatter).
    """
    return _resample_fwd_only(img, idx, w0)


def _resample_fwd_only(img, idx, w0):
    wmax = img.shape[2]

    def per_sample(im, ix, w):  # im (H,W,C), ix (N,K), w (N,K)
        a = jnp.take(im, ix, axis=1)                        # (H,N,K,C)
        b_ = jnp.take(im, jnp.minimum(ix + 1, wmax - 1), axis=1)
        out = a * w[None, :, :, None] + b_ * (1.0 - w[None, :, :, None])
        return out.transpose(1, 0, 2, 3)                    # (N,H,K,C)

    return jax.vmap(per_sample)(img, idx, w0)


def _resample_fwd(img, idx, w0):
    return _resample_fwd_only(img, idx, w0), (idx, w0, img[:, :0])


def _resample_bwd(res, ct):
    idx, w0, ph = res
    b, _, w, c = ph.shape
    h = ct.shape[2]
    idtype = ph.dtype
    n, k = idx.shape[1], idx.shape[2]
    idx1 = jnp.minimum(idx + 1, w - 1)
    cols = jnp.arange(w, dtype=idx.dtype)[None, :, None, None]  # (1,W,1,1)
    # weighted one-hot (B, W, N, K): both taps folded into one matrix
    a = (cols == idx[:, None]).astype(jnp.float32) * \
        w0[:, None].astype(jnp.float32)
    a = a + (cols == idx1[:, None]).astype(jnp.float32) * \
        (1.0 - w0[:, None].astype(jnp.float32))
    a = a.reshape(b, w, n * k)
    ctf = ct.transpose(0, 1, 3, 2, 4).reshape(b, n * k, h * c)
    d = jnp.einsum("bwk,bkf->bwf", a.astype(ctf.dtype), ctf,
                   preferred_element_type=jnp.float32)
    d = d.reshape(b, w, h, c).transpose(0, 2, 1, 3).astype(idtype)
    return d, None, None


resample2tap.defvjp(_resample_fwd, _resample_bwd)
