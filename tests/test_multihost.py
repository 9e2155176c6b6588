"""Multi-host input-path unit tests (single-process logical checks).

Real multi-host needs >1 JAX processes; here we verify the pieces that can
be checked logically (SURVEY.md §5.8): the per-process batch slicing math
partitions the global batch, and make_process_global_batch degenerates to a
plain sharded device_put in a single process.
"""

import numpy as np

import jax
import jax.numpy as jnp

from tvqvae_tpu.data import make_batches
from tvqvae_tpu.parallel import (
    make_mesh,
    make_process_global_batch,
    shard_batch,
)


def test_process_slices_partition_global_batch():
    X = np.arange(40, dtype=np.float32).reshape(40, 1)
    y = np.arange(40).reshape(40, 1)
    B, P = 8, 2

    globals_ = list(make_batches(X, y, B, shuffle=True, seed=3))
    parts = [
        list(make_batches(X, y, B, shuffle=True, seed=3,
                          process_index=pi, process_count=P))
        for pi in range(P)
    ]
    assert len(globals_) == len(parts[0]) == len(parts[1])
    for (gx, gy), (x0, y0), (x1, y1) in zip(globals_, *parts):
        assert x0.shape == (B // P, 1)
        np.testing.assert_array_equal(np.concatenate([x0, x1]), gx)
        np.testing.assert_array_equal(np.concatenate([y0, y1]), gy)


def test_process_slices_identical_order_across_hosts():
    # the shuffle must be host-identical: each process's slice is a function
    # of (seed, epoch) only, so re-running the same process gives the same
    # sequence
    X = np.arange(32, dtype=np.float32).reshape(32, 1)
    a = [xb for xb, _ in make_batches(X, None, 8, shuffle=True, seed=7,
                                      process_index=1, process_count=2)]
    b = [xb for xb, _ in make_batches(X, None, 8, shuffle=True, seed=7,
                                      process_index=1, process_count=2)]
    for xa, xb in zip(a, b):
        np.testing.assert_array_equal(xa, xb)


def test_make_process_global_batch_single_process():
    mesh = make_mesh()
    x = np.random.default_rng(0).normal(size=(16, 3)).astype(np.float32)
    g = make_process_global_batch(mesh, x)
    s = shard_batch(mesh, jnp.asarray(x))
    assert g.shape == (16, 3)
    assert g.sharding.spec == s.sharding.spec
    np.testing.assert_array_equal(np.asarray(g), np.asarray(s))

    # pytree with None leaves (y=None path in the batchers)
    gx, gy = make_process_global_batch(mesh, (x, None))
    assert gy is None
    np.testing.assert_array_equal(np.asarray(gx), x)
