"""Multi-process (multi-host) data parallelism.

The reference's multi-GPU story is torch DDP under basicsr's launcher
(``Train/options/train.yml:191-195``, ``Train/README.md:50``): one
process per GPU, NCCL all-reduce. The TPU-native equivalent for pods /
multi-slice (SURVEY.md §5.8): one process per host, connected through
``jax.distributed.initialize``; each host loads its own shard of the
global batch and wraps it into one global jax.Array with
``jax.make_array_from_process_local_data``; the jitted SPMD train step
is unchanged — the partitioner inserts cross-host collectives (over DCN
when the mesh has a ``dcn`` axis) exactly as it inserts ICI psums in the
single-process case.

Validated by ``tests/test_distributed.py``: a 2-process x 4-virtual-CPU-
device launch of the real reduced train step must produce the same loss
as the single-process 8-device run on the same global batch.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np


def maybe_initialize(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Connect this process to the JAX distributed runtime.

    Explicit args (or ``MARCONET_COORDINATOR`` / ``MARCONET_NUM_PROCS``
    / ``MARCONET_PROC_ID`` env vars) drive CPU/GPU-style launches and
    tests; with no args on a TPU pod, ``jax.distributed.initialize``
    auto-detects the topology from the TPU environment. A single-process
    run (no args, no pod env) is a no-op.
    """
    import jax

    coordinator = coordinator or os.environ.get("MARCONET_COORDINATOR")
    if num_processes is None and os.environ.get("MARCONET_NUM_PROCS"):
        num_processes = int(os.environ["MARCONET_NUM_PROCS"])
    if process_id is None and os.environ.get("MARCONET_PROC_ID"):
        process_id = int(os.environ["MARCONET_PROC_ID"])

    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return
    # Auto-detect only a genuinely multi-host TPU environment. A
    # single-host runtime may still set TPU_WORKER_HOSTNAMES (to one
    # name — e.g. the axon remote-TPU shim sets "localhost"), where
    # jax.distributed.initialize() has no coordinator to find.
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hosts.split(",") if h.strip()]) > 1 or \
            os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def local_batch_slice(tree: Any, global_rows: int) -> Any:
    """This process's contiguous axis-0 rows of a global batch pytree.

    Used when one logical batch is materialized identically on every
    host (tests, deterministic replays); production loaders instead
    synthesize only their own rows and skip this.
    """
    import jax

    if global_rows % jax.process_count():
        raise ValueError(f"global batch {global_rows} not divisible by "
                         f"{jax.process_count()} processes")
    per = global_rows // jax.process_count()
    lo = jax.process_index() * per
    return jax.tree.map(lambda x: x[lo:lo + per], tree)


def make_global_batch(mesh, local_tree: Any, axis: Any = None) -> Any:
    """Per-process local batch shards -> one global batch pytree.

    Every leaf is a host numpy array holding THIS process's rows of the
    global batch (axis 0); the result's leaves are global ``jax.Array``s
    with axis 0 sharded over ``axis`` (default: ALL mesh axes — pure
    data parallelism over e.g. ``('dcn', 'data')``) —
    ``jax.make_array_from_process_local_data`` places each host's rows
    on its own devices, so batch data never crosses DCN. With one
    process this degenerates to a plain device_put with the batch
    sharding.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    if axis is None:
        axis = tuple(mesh.axis_names)
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sh, np.asarray(x)), local_tree)


def local_rows(arr) -> np.ndarray:
    """This process's addressable axis-0 rows of a global ``jax.Array``,
    concatenated in global row order (replica shards deduped).

    The read-side inverse of :func:`make_global_batch` for outputs of an
    SPMD step: under pure data parallelism each host's addressable
    shards hold exactly the result rows for the batch rows that host fed
    in, so rank 0 can assemble its own rows of a batched output without
    any cross-host gather. Used for multi-process visual validation —
    the reference logs visuals on rank 0 under DDP
    (``Train/tspgan/models/tspgan_model.py:610-612``). Batch (ndim >= 1)
    arrays only.
    """
    shards = {}
    for s in arr.addressable_shards:
        idx = s.index[0] if s.index else slice(None)
        start = 0 if idx.start is None else int(idx.start)
        shards.setdefault(start, np.asarray(s.data))
    return np.concatenate([shards[k] for k in sorted(shards)], axis=0)
