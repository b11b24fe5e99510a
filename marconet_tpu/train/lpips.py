"""LPIPS perceptual loss (VGG16 backbone + learned linear heads).

JAX re-implementation of the ``lpips.LPIPS(net='vgg')`` loss the reference
uses for SR patches (``LPIPSLossF``, ``Train/tspgan/losses/text_loss.py:
77-105``): inputs in [-1,1] are shifted/scaled, VGG16 features are tapped
after relu1_2/relu2_2/relu3_3/relu4_3/relu5_3, channel-unit-normalized,
squared-differenced, reduced by learned 1x1 "lin" heads and averaged.

Weights: convert from torchvision's ``vgg16`` features state dict + the
lpips ``v0.1/vgg.pth`` lin weights via ``convert_lpips_weights``. Without
weight files (zero-egress environments) ``init`` gives random weights —
fine for pipeline tests, not for training quality.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from marconet_tpu.ops.layers import Conv

# VGG16 conv plan: (channels, convs-in-block); taps after each block's relu
_VGG_BLOCKS = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

# lpips scaling layer constants
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 feature trunk; returns the 5 tapped activations.

    ``width`` scales the channel plan (1.0 = exact torchvision VGG16);
    reduced widths serve the structurally-identical dryrun/CI tiers.
    """

    width: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        taps = []
        for bi, (ch, n_convs) in enumerate(_VGG_BLOCKS):
            ch = max(8, int(round(ch * self.width)))
            for ci in range(n_convs):
                x = Conv(ch, dtype=self.dtype,
                         name=f"conv{bi + 1}_{ci + 1}")(x)
                x = jax.nn.relu(x)
            taps.append(x)
            if bi < len(_VGG_BLOCKS) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


class LPIPS(nn.Module):
    """Perceptual distance; inputs NHWC in [-1, 1]."""

    width: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pred, target):
        shift = jnp.asarray(_SHIFT, self.dtype)
        scale = jnp.asarray(_SCALE, self.dtype)
        vgg = VGG16Features(width=self.width, dtype=self.dtype, name="vgg")

        def feats(x):
            return vgg((x - shift) / scale)

        f0, f1 = feats(pred), feats(target)
        total = 0.0
        for i, (a, b) in enumerate(zip(f0, f1)):
            a = a * jax.lax.rsqrt(
                jnp.sum(jnp.square(a), -1, keepdims=True) + 1e-10)
            b = b * jax.lax.rsqrt(
                jnp.sum(jnp.square(b), -1, keepdims=True) + 1e-10)
            diff = jnp.square(a - b)
            r = Conv(1, kernel_size=(1, 1), padding="VALID", use_bias=False,
                     dtype=self.dtype, name=f"lin{i}")(diff)
            total = total + r.mean(axis=(1, 2, 3))
        return total  # (B,)


def convert_lpips_weights(vgg_state: Dict[str, np.ndarray],
                          lin_state: Dict[str, np.ndarray]):
    """torchvision ``vgg16().features`` + lpips lin state dicts -> variables.

    vgg_state keys: ``features.{idx}.weight/bias`` (or bare ``{idx}.weight``)
    with torchvision layer indices; lin_state keys:
    ``lin{i}.model.1.weight``.
    """
    def get(sd, *names):
        for n in names:
            if n in sd:
                return np.asarray(sd[n], np.float32)
        raise KeyError(names)

    def t_conv(w):
        return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))

    params: Dict[str, Any] = {"vgg": {}}
    idx = 0
    for bi, (ch, n_convs) in enumerate(_VGG_BLOCKS):
        for ci in range(n_convs):
            params["vgg"][f"conv{bi + 1}_{ci + 1}"] = {
                "kernel": t_conv(get(vgg_state, f"features.{idx}.weight",
                                     f"{idx}.weight")),
                "bias": get(vgg_state, f"features.{idx}.bias",
                            f"{idx}.bias"),
            }
            idx += 2  # conv + relu
        idx += 1  # maxpool
    for i in range(5):
        params[f"lin{i}"] = {
            "kernel": t_conv(get(lin_state, f"lin{i}.model.1.weight"))}
    return {"params": params}


# candidate filenames searched by ``load_lpips_variables``
_VGG_FILES = ("vgg16-397923af.pth", "vgg16.pth", "vgg16_features.pth")
_LIN_FILES = ("lpips_vgg.pth", "lpips_vgg_v0.1.pth", "vgg_lpips.pth",
              "vgg.pth")


def load_lpips_variables(ckpt_dir: Optional[str]):
    """Load + convert real LPIPS weights from a checkpoint directory.

    Looks for a torchvision VGG16 state dict (``vgg16-397923af.pth``) and
    the lpips v0.1 linear heads (``lpips_vgg.pth``, the lpips package's
    ``weights/v0.1/vgg.pth``). Returns converted variables, or ``None``
    when either file is absent — the trainer then runs with RANDOM VGG
    weights, which is a materially different objective from the
    reference's pretrained LPIPS (``Train/tspgan/losses/text_loss.py:
    77-105``); callers must warn or fail loudly.
    """
    import os

    if not ckpt_dir:
        return None

    def find(names):
        for n in names:
            p = os.path.join(ckpt_dir, n)
            if os.path.exists(p):
                return p
        return None

    vgg_path, lin_path = find(_VGG_FILES), find(_LIN_FILES)
    if vgg_path is None or lin_path is None:
        return None
    import torch

    vgg_sd = torch.load(vgg_path, map_location="cpu", weights_only=True)
    lin_sd = torch.load(lin_path, map_location="cpu", weights_only=True)
    to_np = {k: v.numpy() for k, v in vgg_sd.items()}
    lin_np = {k: v.numpy() for k, v in lin_sd.items()}
    print(f"LPIPS: loaded pretrained VGG16 ({os.path.basename(vgg_path)})"
          f" + lin heads ({os.path.basename(lin_path)})")
    return convert_lpips_weights(to_np, lin_np)
