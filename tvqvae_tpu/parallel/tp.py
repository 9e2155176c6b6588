"""Tensor parallelism over a 2-D (data, model) mesh.

The pipeline's default scale-out is batch data-parallelism (mesh.py;
SURVEY.md §5.8 — the reference's only distributed touchpoint is the VQ-EMA
all-reduce, timevqvae/models/vq.py:155,229,234). Tensor parallelism is the
OPTIONAL second mesh axis for when per-chip HBM headroom, not batch math,
is the constraint: the stage-1 model carries two Linear(4633, 4633) decoder
time-heads (42.9 M params) and ~94 M params of 1024-channel conv kernels,
and with fp32 AdamW state that is ~2.2 GB of always-resident optimizer+param
bytes per replica — sharding the big weights over `model` divides it.

TPU-first shape: we do NOT rewrite any module. GSPMD partitions the jitted
step from the *placement of the inputs* alone — big parameter leaves are
device_put with a NamedSharding that shards their largest divisible axis
over `model` (Dense kernels then shard their output-feature axis; the 2-D
conv kernels their output-channel axis — both are contraction-free axes of
the forward matmul, so the forward needs no extra communication and the
backward's gradient reduce-scatters ride ICI), everything else (BN stats,
VQ codebooks, biases below the size floor) stays replicated, batches shard
over `data` exactly as in the 1-D mesh. XLA inserts the all-gathers /
reduce-scatters; optimizer moments inherit the param shardings through
`tx.init` (zeros_like preserves sharding), so AdamW state is sharded too.

Non-axes, for the record (why dp+tp is the complete mesh story for this
model family): no sequence parallelism — the spectral+conv compression
already reduces L=4633 to 27/108 tokens before the transformer (SURVEY
§5.7); no expert parallelism — no MoE anywhere in the reference; no
pipeline parallelism — the three stages are data-dependent phases trained
to completion in sequence (frozen-stage handoff), not a layer pipeline.
"""

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Leaves smaller than this stay replicated: sharding tiny tensors buys no
# memory and costs collective latency. 2^16 elements = 256 KB fp32.
# Read late (not bound as a def-time default) so tests can lower it to
# engage the rule on tiny geometries.
MIN_SHARD_ELEMS = 2 ** 16


def _min_elems(v):
    return MIN_SHARD_ELEMS if v is None else v


def make_mesh2d(n_data: int, n_model: int, devices=None) -> Mesh:
    """(n_data, n_model) mesh with axes ("data", "model").

    On real hardware pass devices ordered so `model` groups are
    ICI-adjacent (the default jax.devices() order is torus-contiguous on
    TPU slices, which is what we want: TP collectives are per-step,
    DP collectives once per step — keep TP on the fastest links).
    """
    devices = devices if devices is not None else jax.devices()
    n = n_data * n_model
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    return Mesh(
        np.asarray(devices[:n]).reshape(n_data, n_model), ("data", "model")
    )


def tp_leaf_spec(x, n_model: int, min_elems=None):
    """PartitionSpec sharding x's largest n_model-divisible axis over
    `model`; replicated if x is small or nothing divides.

    Ties/equal sizes prefer the LAST axis: flax Dense kernels are
    (in, out) and conv kernels HWIO — the trailing axis is the output
    feature/channel axis, the contraction-free side of the forward matmul.
    """
    min_elems = _min_elems(min_elems)
    shape = getattr(x, "shape", ())
    size = int(np.prod(shape)) if shape else 0
    if size < min_elems:
        return P()
    best = None
    for d in range(len(shape)):  # later axes win ties
        if shape[d] % n_model == 0 and shape[d] >= n_model:
            if best is None or shape[d] >= shape[best]:
                best = d
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = "model"
    return P(*spec)


def tp_tree_sharding(mesh: Mesh, tree, min_elems=None):
    """NamedSharding pytree for params: big leaves sharded over `model`."""
    n_model = mesh.shape["model"]
    return jax.tree.map(
        lambda x: NamedSharding(mesh, tp_leaf_spec(x, n_model, min_elems)),
        tree,
    )


def shard_params_tp(mesh: Mesh, params, min_elems=None):
    """device_put params with the TP sharding rule (others replicate)."""
    shardings = tp_tree_sharding(mesh, params, min_elems)
    return jax.tree.map(jax.device_put, params, shardings)


def replicate_tree2d(mesh: Mesh, tree):
    """Fully replicate a pytree on the 2-D mesh (BN stats, VQ codebooks)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_batch2d(mesh: Mesh, batch):
    """Batch axis over `data`, replicated over `model` (the TP group sees
    the full per-data-shard batch; same global batch as the 1-D mesh)."""
    def put(x):
        if x is None:
            return None
        spec = P("data", *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch, is_leaf=lambda v: v is None)


def shard_train_state_tp(mesh: Mesh, state, min_elems=None):
    """Apply the TP rule to a whole train state: params and optimizer
    state (whose moment leaves mirror the param shapes, so the same
    shape-keyed rule shards them identically) split over `model`;
    everything else — BN stats, VQ codebooks, step counters — replicates.

    This is the runner-side entry point: `train_stage{1,2,3}(..., tp=N)`
    builds a 2-D mesh and passes the freshly created (or snapshot-restored)
    state through here; the jitted step itself is unchanged — GSPMD
    partitions it from these placements.
    """
    n_model = mesh.shape["model"]
    repl = NamedSharding(mesh, P())

    def put_rule(x):
        return jax.device_put(
            x, NamedSharding(mesh, tp_leaf_spec(x, n_model, min_elems))
        )

    updates = {}
    for name in state.__dataclass_fields__:
        val = getattr(state, name)
        if name in ("params", "opt_state"):
            updates[name] = jax.tree.map(put_rule, val)
        else:
            updates[name] = jax.tree.map(
                lambda x: jax.device_put(x, repl), val
            )
    return state.replace(**updates)


def sharded_fraction(tree) -> float:
    """Diagnostic: fraction of parameter BYTES whose committed sharding
    actually splits over `model` (proof the TP rule engaged, used by
    tests/test_tp.py and dryrun_multichip)."""
    total = 0
    sharded = 0
    for leaf in jax.tree.leaves(tree):
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        total += n
        spec: Any = getattr(getattr(leaf, "sharding", None), "spec", None)
        if spec is not None and any(s == "model" for s in spec if s):
            sharded += n
    return sharded / max(total, 1)
