from marconet_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    batch_sharding,
)
from marconet_tpu.parallel.distributed import (
    maybe_initialize,
    make_global_batch,
    local_batch_slice,
    local_rows,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "batch_sharding",
           "maybe_initialize", "make_global_batch", "local_batch_slice",
           "local_rows"]
