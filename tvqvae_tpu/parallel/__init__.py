from .mesh import (
    bundle_sharding,
    data_sharding,
    make_mesh,
    make_process_global_batch,
    prefetch_batches,
    replicate_tree,
    shard_batch,
)

__all__ = [
    "bundle_sharding",
    "data_sharding",
    "make_mesh",
    "make_process_global_batch",
    "prefetch_batches",
    "replicate_tree",
    "shard_batch",
]
