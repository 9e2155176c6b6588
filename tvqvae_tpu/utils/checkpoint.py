"""Orbax checkpoint IO.

Replaces the reference's Lightning `save_checkpoint`/`load_from_checkpoint`
chaining (timevqvae/scripts/train.py:46-50,115-123; models/maskgit.py:52-59)
with explicit per-stage param trees plus a JSON meta sidecar carrying the
static info sampling-time code needs (config snapshot, input geometry,
scaler state, FE tau — SURVEY.md §5.4).

Unlike the reference (no mid-run checkpoints, `enable_checkpointing=False`),
train loops here may save periodically and resume: the full train state
(params, batch stats, VQ codebooks, optimizer state, step) round-trips.
"""

import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _process_index() -> int:
    return jax.process_index()


def _process_count() -> int:
    return jax.process_count()


def _primary_host() -> bool:
    """True when this process should write checkpoints. All saved trees are
    fully replicated (params/codebooks/opt state), so under multi-host SPMD
    only process 0 writes; the others barrier so nobody races ahead with a
    half-written file on shared storage."""
    return _process_count() == 1 or _process_index() == 0


def _multihost_barrier(tag: str) -> None:
    if _process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def save_checkpoint(path: str, tree: Any, meta: Optional[dict] = None) -> None:
    path = os.path.abspath(path)
    if _primary_host():
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # EVERY process enters the orbax save: Checkpointer.save runs its own
    # cross-process sync_global_devices barriers internally and gates the
    # actual leaf writes to the primary itself — calling it from only the
    # primary mismatches those barriers against ours and deadlocks/crashes
    # the other processes (caught by tests/test_multiprocess_spmd.py under
    # a real 2-process jax.distributed runtime).
    ckptr = ocp.PyTreeCheckpointer()
    # Host-materialize fully-addressable leaves (np.asarray); a NON-fully-
    # addressable jax.Array (sharded across processes) would make np.asarray
    # raise, so pass it through intact — orbax writes per-process shards
    # itself (ADVICE r3 #3: the replication constraint is now handled, not
    # silently assumed).
    def _host_leaf(a):
        if isinstance(a, jax.Array) and not a.is_fully_addressable:
            return a
        return np.asarray(a)

    ckptr.save(path, jax.tree.map(_host_leaf, tree), force=True)
    if meta is not None and _primary_host():
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f, indent=2, default=_json_default)
    _multihost_barrier(f"save_checkpoint:{path}")


def load_checkpoint(path: str) -> Tuple[Any, Optional[dict]]:
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.restore(path)
    meta = None
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta = json.load(f)
    return tree, meta


def _json_default(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(f"not JSON serializable: {type(o)}")


# --------------------------------------------------------------------------
# mid-run train-state snapshots (resume support — absent in the reference,
# SURVEY.md §5.4: `enable_checkpointing=False`, no mid-stage restarts)


def save_train_state(path: str, state: Any) -> None:
    """Serialize a full train state (params, batch stats, codebooks,
    optimizer state, step) for in-place resume. Uses flax msgpack so optax
    NamedTuple states round-trip by structure."""
    from flax import serialization

    path = os.path.abspath(path)
    if _primary_host():
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.to_bytes(jax.tree.map(np.asarray, state)))
        os.replace(tmp, path)  # atomic: a crash never leaves a torn snapshot
    _multihost_barrier(f"save_train_state:{path}")


def load_train_state(path: str, template: Any) -> Any:
    """Restore a snapshot into the structure of `template` (a freshly built
    state with identical tree structure and shapes)."""
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


class AsyncSnapshotter:
    """Overlap mid-run snapshot IO with training.

    A full train state is ~2.2 GB at the published stage-1 geometry
    (181.4M params fp32 + two AdamW moments); a synchronous
    `save_train_state` stalls the step loop for the whole device->host
    fetch + disk write — minutes per boundary through a slow host link.
    `__call__` instead (1) SKIPS the boundary if the previous snapshot's
    fetch+write is still in flight (a snapshot is a recovery point, not a
    ledger — never stall the step loop for one; `force=True` joins instead,
    for callers that must land a specific snapshot — the runner's final
    boundary no longer snapshots at all: the stage checkpoint + its meta
    completed_step supersede it), (2) copies the state ON-DEVICE as ONE jitted
    program (HBM->HBM; the round-3 per-leaf `.copy()` cost ~30 s of
    per-leaf dispatch on the relay-backed device — the jitted copy is one
    dispatch) so the training loop may immediately donate its buffers to
    the next step, and (3) hands the copy to a worker thread for the
    fetch + atomic write. Call `join()` before the final `save_checkpoint`
    / before reading the snapshot file.

    The join-at-boundary policy this replaces turned the 190-s snapshot
    fetch into a synchronous stall whenever boundaries arrived closer than
    the fetch took — measured as ~200 s/boundary = 33 of the 80 stage-1
    minutes in the round-3 full-geometry run (PERF.md round-4 dispatch
    probe, section F).

    Multi-host keeps the synchronous path: `save_train_state` barriers all
    processes, and running that barrier on a side thread could interleave
    with main-thread collectives.
    """

    def __init__(self, path: str):
        import threading

        self.path = path
        self._thread = None
        self._copy_fn = None
        self._cancel = threading.Event()
        self.skipped = 0

    def _device_copy(self, state: Any) -> Any:
        """One jitted program copying every jax.Array leaf HBM->HBM."""
        import jax.numpy as jnp

        leaves, treedef = jax.tree.flatten(state)
        is_arr = [isinstance(l, jax.Array) for l in leaves]
        if self._copy_fn is None:
            self._copy_fn = jax.jit(lambda xs: [jnp.copy(x) for x in xs])
        copied = iter(self._copy_fn(
            [l for l, a in zip(leaves, is_arr) if a]
        ))
        out = [next(copied) if a else l for l, a in zip(leaves, is_arr)]
        return jax.tree.unflatten(treedef, out)

    def __call__(self, state: Any, force: bool = False) -> None:
        if _process_count() > 1:
            save_train_state(self.path, state)
            return
        if self._thread is not None and self._thread.is_alive():
            if not force:
                self.skipped += 1
                print("[snapshot] previous snapshot still in flight; "
                      "skipping this boundary")
                return
        self.join()
        snap = self._device_copy(state)
        import threading

        self._thread = threading.Thread(
            target=self._write, args=(snap,), daemon=True
        )
        self._thread.start()

    def _write(self, snap: Any) -> None:
        try:
            # Per-leaf device->host fetch with a cancel check between
            # leaves: on a slow host link the 2.2 GB fetch takes minutes,
            # and `abandon()` (stage end: the final checkpoint supersedes
            # any snapshot) must not wait it out. Largest stage-1 leaves
            # are ~86 MB, so cancellation lands within seconds.
            leaves, treedef = jax.tree.flatten(snap)
            host = []
            for leaf in leaves:
                if self._cancel.is_set():
                    print("[snapshot] abandoned in-flight snapshot "
                          "(superseded by the final checkpoint)")
                    return
                host.append(np.asarray(leaf))
            if self._cancel.is_set():
                return
            save_train_state(self.path, jax.tree.unflatten(treedef, host))
        except Exception as e:  # never kill training over a lost snapshot
            print(f"[snapshot] WARNING: async snapshot failed: {e!r}")

    def join(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None

    def abandon(self) -> None:
        """Stop any still-in-flight snapshot at the next leaf boundary
        WITHOUT writing it, then return. For stage ends: the final
        `save_checkpoint` (whose meta carries completed_step) supersedes
        mid-run snapshots, so joining a stale multi-minute fetch buys
        nothing — measured 174.8 s of pure wait in the round-4 warm
        full-geometry run. A previously COMPLETED snapshot file on disk
        is left intact (it is still a valid, older recovery point)."""
        if self._thread is not None and self._thread.is_alive():
            self._cancel.set()
        self.join()
        self._cancel.clear()
