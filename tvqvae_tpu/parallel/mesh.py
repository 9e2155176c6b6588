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


def bundle_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Sharding for stacked step-bundles (n_steps, B, ...): replicate the
    scan axis, shard the batch axis (axis 1) over `data`."""
    return NamedSharding(mesh, P(None, "data", *([None] * (ndim - 2))))


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with batch-axis sharding.

    Single-process: a plain sharded device_put. Multi-process: the input is
    this process's LOCAL slice of the global batch (see
    data.make_batches(process_index=...)) and the global array is assembled
    via make_process_global_batch.
    """
    if jax.process_count() > 1:
        return make_process_global_batch(mesh, batch)
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), batch
    )


def make_process_global_batch(mesh: Mesh, local_batch):
    """Assemble a globally-sharded batch from per-process local shards
    (jax.make_array_from_process_local_data; SURVEY.md §5.8 multi-host).

    Each process passes its contiguous 1/process_count slice of the global
    batch; the result is a global jax.Array sharded over the `data` axis.
    Works (degenerately) in a single process too, where local == global.
    """
    def put(x):
        if x is None:
            return None
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            data_sharding(mesh, x.ndim), x
        )

    return jax.tree.map(put, local_batch, is_leaf=lambda v: v is None)


def replicate_tree(mesh: Mesh, tree):
    """Fully replicate a pytree (params, opt state, codebooks) on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def prefetch_batches(iterator, mesh: Mesh, size: int = 2, bundled: bool = False):
    """Pipeline host batches onto the mesh from a background thread.

    Two overlaps: (1) jax transfers are async, so `size` batches stay in
    flight ahead of the consumer; (2) a daemon thread advances the host
    iterator (numpy batch assembly + device_put enqueue), so host input work
    runs concurrently with the previous step's device compute instead of
    serializing inside next() — on a slow host this is the difference
    between input-bound and device-bound stepping. NOTE: on this
    environment's relayed backend the host->device data path itself is the
    bottleneck (~1 MB/s effective — a tunnel artifact; real TPU-VM hosts
    feed via local DMA), so drain-verified train-LOOP rates here reflect
    the relay, not the framework (PERF.md).
    """
    import queue
    import threading

    import jax.numpy as jnp

    multiproc = jax.process_count() > 1
    # Bundled (n_steps, B, ...) stacks are unsupported multi-host:
    # make_process_global_batch shards axis 0, which for a bundle is the
    # scan axis, not the batch axis — fail loudly instead of mis-sharding.
    assert not (bundled and multiproc), (
        "prefetch_batches(bundled=True) is not supported with "
        "jax.process_count() > 1 (axis-0 sharding would split the scan "
        "axis); use bundle_steps=1 on multi-host."
    )

    shard_fn = bundle_sharding if bundled else data_sharding

    def put(item):
        if multiproc:
            return make_process_global_batch(mesh, item)
        return jax.tree.map(
            lambda v: v if v is None else jax.device_put(
                jnp.asarray(v), shard_fn(mesh, np.ndim(v))
            ),
            item,
            is_leaf=lambda v: v is None,
        )

    q: "queue.Queue" = queue.Queue(maxsize=max(size, 1))
    _END = object()

    class _PrefetchError:
        def __init__(self, exc):
            self.exc = exc

    def producer():
        try:
            for item in iterator:
                q.put(put(item))
        except Exception as e:  # surface errors at the consumer
            q.put(_PrefetchError(e))
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, _PrefetchError):
            raise item.exc
        yield item
