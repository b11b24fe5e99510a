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
              axes: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Mesh over the available devices.

    1-D (the default ``('data',)`` axis) takes the first ``n_devices``
    devices. Multi-axis meshes (e.g. ``('dcn', 'data')`` for multi-slice
    scale-out) require an explicit ``shape`` whose product matches the
    device count — there is no implicit split heuristic.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    arr = np.asarray(devices)
    if len(axes) > 1:
        if shape is None:
            raise ValueError(
                f"make_mesh with axes={tuple(axes)} needs an explicit "
                f"shape (e.g. shape=(2, {len(devices) // 2}))")
        if len(shape) != len(axes) or int(np.prod(shape)) != len(devices):
            raise ValueError(
                f"shape {tuple(shape)} does not factor {len(devices)} "
                f"devices over axes {tuple(axes)}")
        arr = arr.reshape(shape)
    elif shape is not None and tuple(shape) != arr.shape:
        raise ValueError(f"shape {tuple(shape)} invalid for 1-D mesh of "
                         f"{len(devices)} devices")
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
    """Replicate every leaf over the whole mesh.

    Single-process: a plain ``device_put``. Multi-process (the mesh spans
    devices this process cannot address): every process holds the same
    host value (deterministic init / checkpoint restore), so the global
    replicated array is assembled from per-process callbacks over the
    addressable shards only.
    """
    sh = replicate(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), tree)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree.map(put, tree)
