"""AsyncSnapshotter: overlapped mid-run snapshots (utils/checkpoint.py).

The hazard this guards: the training loop donates its state buffers to the
next step (jit donate_argnums=0), so a snapshot thread still reading those
buffers would hit deleted memory. The snapshotter copies on-device before
returning; these tests pin (a) value correctness, (b) donation safety —
the snapshot taken BEFORE a donating step must capture the pre-step values
even when the step runs while the write is in flight, and (c) the join
contract.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvqvae_tpu.utils.checkpoint import (
    AsyncSnapshotter,
    load_train_state,
    save_train_state,
)


def _state(v: float):
    return {"w": jnp.full((64, 64), v, jnp.float32),
            "step": jnp.asarray(int(v), jnp.int32)}


def test_roundtrip_matches_sync(tmp_path):
    path_a = os.path.join(tmp_path, "a.train")
    path_b = os.path.join(tmp_path, "b.train")
    state = _state(3.0)
    save_train_state(path_a, state)
    snap = AsyncSnapshotter(path_b)
    snap(state)
    snap.join()
    tmpl = jax.tree.map(np.zeros_like, state)
    a = load_train_state(path_a, tmpl)
    b = load_train_state(path_b, tmpl)
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(la, lb)


def test_donation_safety(tmp_path):
    """Snapshot, then immediately run a donating step on the same state:
    the snapshot must hold the PRE-step values."""
    path = os.path.join(tmp_path, "s.train")

    @jax.jit
    def step(state):
        return {"w": state["w"] + 1.0, "step": state["step"] + 1}

    step_donating = jax.jit(step, donate_argnums=0)
    state = _state(5.0)
    state = jax.tree.map(jnp.asarray, state)
    snap = AsyncSnapshotter(path)
    snap(state)
    # donate the original buffers while the write may still be in flight
    state = step_donating(state)
    snap.join()
    got = load_train_state(path, jax.tree.map(np.zeros_like, state))
    assert float(np.max(got["w"])) == 5.0
    assert int(got["step"]) == 5


def test_skip_while_in_flight_then_force_lands(tmp_path):
    """Boundary policy (round 4): a boundary arriving while the previous
    snapshot's fetch+write is still in flight is SKIPPED (never stall the
    step loop — the join-at-boundary policy cost ~200 s/boundary in the
    round-3 full run), and `force=True` (the final boundary) joins and
    lands regardless."""
    import threading

    path = os.path.join(tmp_path, "s.train")
    snap = AsyncSnapshotter(path)
    gate = threading.Event()
    orig_write = snap._write

    def slow_write(s):
        gate.wait(timeout=30)
        orig_write(s)

    snap._write = slow_write
    snap(_state(1.0))
    snap(_state(2.0))  # previous write blocked -> skipped
    assert snap.skipped == 1
    gate.set()
    snap(_state(7.0), force=True)  # joins the in-flight write, then lands
    snap.join()
    got = load_train_state(path, jax.tree.map(np.zeros_like, _state(0.0)))
    assert float(np.max(got["w"])) == 7.0


def test_abandon_cancels_in_flight_write(tmp_path):
    """Stage-end policy (round 4): `abandon()` stops a still-in-flight
    snapshot at the next leaf boundary WITHOUT waiting out the fetch
    (measured 174.8 s of pure join wait in the warm full-geometry run)
    and leaves any previously COMPLETED snapshot file intact."""
    import threading
    import time

    path = os.path.join(tmp_path, "s.train")
    snap = AsyncSnapshotter(path)
    snap(_state(1.0))  # completes normally
    snap.join()
    assert os.path.exists(path)

    # second snapshot: block the fetch mid-tree, then abandon
    gate = threading.Event()
    real_asarray = np.asarray
    state2 = _state(2.0)

    def slow_write(s):
        gate.wait(timeout=30)
        AsyncSnapshotter._write(snap, s)

    snap._write = slow_write
    snap(state2)
    t0 = time.time()
    gate.set()
    snap._cancel.set()  # cancel lands before (or between) leaf fetches
    snap.abandon()
    assert time.time() - t0 < 10
    assert not snap._cancel.is_set()  # reusable after abandon
    # the completed FIRST snapshot is still on disk, unmodified
    got = load_train_state(path, jax.tree.map(np.zeros_like, _state(0.0)))
    assert float(np.max(got["w"])) == 1.0
    del real_asarray


def test_abandon_without_thread_is_noop(tmp_path):
    snap = AsyncSnapshotter(os.path.join(tmp_path, "s.train"))
    snap.abandon()  # no thread: must not raise


def test_write_failure_does_not_raise(tmp_path, capsys):
    bad = os.path.join(tmp_path, "nodir_parent")
    with open(bad, "w") as f:
        f.write("a file, not a directory")
    snap = AsyncSnapshotter(os.path.join(bad, "x", "s.train"))
    snap(_state(1.0))
    snap.join()  # must not raise; failure is reported, training continues
    out = capsys.readouterr().out
    assert "async snapshot failed" in out
