from .mesh import (
    data_sharding,
    make_mesh,
    make_process_global_batch,
    prefetch_batches,
    replicate_tree,
    shard_batch,
)

__all__ = [
    "data_sharding",
    "make_mesh",
    "make_process_global_batch",
    "prefetch_batches",
    "replicate_tree",
    "shard_batch",
]
