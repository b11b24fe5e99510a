"""Device mesh + sharding helpers (data parallelism over ICI).

The reference's only parallelism is DDP/NCCL delegated to basicsr
(``Train/options/train.yml:191-195``; SURVEY.md §2 parallelism note). The
TPU-native equivalent: a 1-D ``Mesh(('data',))`` over ICI, batch tensors
sharded on axis 0, parameters replicated; the SPMD partitioner inserts the
gradient all-reduce (``psum``) that NCCL performed. A second ``dcn`` axis
can be layered for multi-slice scale-out (``make_mesh(axes=...)``).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axes: Sequence[str] = ("data",)) -> Mesh:
    """1-D (or reshaped multi-axis) mesh over the available devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    arr = np.asarray(devices)
    if len(axes) > 1:
        # trailing axes absorb the devices; leading axes get size 1 unless
        # the device count divides evenly (caller controls the split)
        per = int(round(len(devices) ** (1.0 / len(axes))))
        shape = [len(devices) // per, per] if len(axes) == 2 else None
        arr = arr.reshape(shape)
    return Mesh(arr, axes)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits axis 0 of a batch tensor across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis: str = "data") -> Any:
    """Device-put every leaf of a batch pytree with axis-0 sharding."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate_tree(mesh: Mesh, tree: Any) -> Any:
    sh = replicate(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
