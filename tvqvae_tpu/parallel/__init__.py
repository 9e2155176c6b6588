from .mesh import (
    bundle_sharding,
    data_sharding,
    make_mesh,
    make_process_global_batch,
    prefetch_batches,
    replicate_tree,
    shard_batch,
)
from .tp import (
    make_mesh2d,
    replicate_tree2d,
    shard_batch2d,
    shard_params_tp,
    sharded_fraction,
    tp_tree_sharding,
)

__all__ = [
    "bundle_sharding",
    "data_sharding",
    "make_mesh",
    "make_mesh2d",
    "make_process_global_batch",
    "prefetch_batches",
    "replicate_tree",
    "replicate_tree2d",
    "shard_batch",
    "shard_batch2d",
    "shard_params_tp",
    "sharded_fraction",
    "tp_tree_sharding",
]
