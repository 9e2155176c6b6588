"""Device mesh + sharding helpers.

The pipeline scales by batch data-parallelism over ICI (SURVEY.md §5.8): a
1-D `data` mesh, batches sharded on axis 0, parameters/codebooks replicated.
Everything runs under jit with GSPMD — the VQ codebook EMA statistics (the
reference's only distributed touchpoint, timevqvae/models/vq.py:155,229,234)
become automatic all-reduces because they are `sum(0)` over the sharded
batch axis. Multi-host extends this by giving each host its own input shard
(jax.make_array_from_process_local_data) over the same mesh.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = -1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data == -1:
        n_data = len(devices)
    return Mesh(np.asarray(devices[:n_data]).reshape(n_data), ("data",))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 (batch) over `data`, replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with batch-axis sharding."""
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), batch
    )


def replicate_tree(mesh: Mesh, tree):
    """Fully replicate a pytree (params, opt state, codebooks) on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def prefetch_batches(iterator, mesh: Mesh, size: int = 2):
    """Double-buffer host batches onto the mesh.

    jax transfers are async; keeping `size` batches in flight overlaps the
    host->device copy (measured ~3 ms for a stage-1 batch through the
    tunnel) with the previous step's compute.
    """
    import collections

    import jax.numpy as jnp

    q = collections.deque()

    def put(item):
        q.append(jax.tree.map(
            lambda v: v if v is None else jax.device_put(
                jnp.asarray(v), data_sharding(mesh, np.ndim(v))
            ),
            item,
            is_leaf=lambda v: v is None,
        ))

    for item in iterator:
        put(item)
        if len(q) > size:
            yield q.popleft()
    while q:
        yield q.popleft()
