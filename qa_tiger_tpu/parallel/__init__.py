from qa_tiger_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    param_shardings,
    shard_batch,
    sync_processes,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "param_shardings",
    "shard_batch",
    "sync_processes",
]
