"""Multi-host checkpoint gating unit tests (single-process logical checks).

Real multi-host restore needs >1 JAX processes; here we verify the gating
logic that can be checked in one process (STATUS gap: "multi-host restore is
untested"): non-primary processes never touch the filesystem, every process
hits the barrier (so process 0 finishing a write releases the others), and a
primary-written snapshot restores bit-identically on any process.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from tvqvae_tpu.utils import checkpoint as ckpt


class _FakeMultiHost:
    """Monkeypatch jax.process_index/process_count and count barriers."""

    def __init__(self, monkeypatch, index, count):
        self.barriers = []
        monkeypatch.setattr(ckpt, "_process_index", lambda: index)
        monkeypatch.setattr(ckpt, "_process_count", lambda: count)
        monkeypatch.setattr(
            ckpt, "_multihost_barrier", lambda tag: self.barriers.append(tag)
        )


def _tree():
    return {
        "w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "b": jnp.asarray([1.5, -2.0]),
    }


def test_non_primary_process_never_writes(tmp_path, monkeypatch):
    """Non-primary gating. Orbax saves are NOT gated here: every process
    must enter Checkpointer.save (it runs its own cross-process barriers and
    gates leaf writes to the primary internally — the primary-only call
    crashed the real 2-process runtime, tests/test_multiprocess_spmd.py).
    Under this single-process mock orbax's real process_index is 0, so the
    tree writes; the assertable gating is the meta sidecar and the flax
    snapshot, which this module owns."""
    fake = _FakeMultiHost(monkeypatch, index=3, count=4)
    path = str(tmp_path / "ckpt" / "stage1")

    ckpt.save_checkpoint(path, _tree(), meta={"k": 1})
    assert not os.path.exists(path + ".meta.json")
    assert fake.barriers == [f"save_checkpoint:{os.path.abspath(path)}"]

    snap = str(tmp_path / "snap.msgpack")
    ckpt.save_train_state(snap, _tree())
    assert not os.path.exists(snap)
    assert len(fake.barriers) == 2


def test_primary_process_writes_and_barriers(tmp_path, monkeypatch):
    fake = _FakeMultiHost(monkeypatch, index=0, count=4)
    path = str(tmp_path / "ckpt" / "stage1")

    tree = _tree()
    ckpt.save_checkpoint(path, tree, meta={"tau": 0.5})
    assert os.path.exists(path)
    assert os.path.exists(path + ".meta.json")
    assert len(fake.barriers) == 1

    restored, meta = ckpt.load_checkpoint(path)
    assert meta == {"tau": 0.5}
    np.testing.assert_array_equal(restored["w"], np.asarray(tree["w"]))
    np.testing.assert_array_equal(restored["b"], np.asarray(tree["b"]))


def test_snapshot_written_by_primary_restores_anywhere(tmp_path, monkeypatch):
    snap = str(tmp_path / "snap.msgpack")
    tree = _tree()

    _FakeMultiHost(monkeypatch, index=0, count=2)
    ckpt.save_train_state(snap, tree)
    assert os.path.exists(snap)
    assert not os.path.exists(snap + ".tmp")  # atomic rename, no leftovers

    # restore on a non-primary process (template-shaped)
    _FakeMultiHost(monkeypatch, index=1, count=2)
    template = {"w": jnp.zeros((2, 3)), "b": jnp.zeros((2,))}
    out = ckpt.load_train_state(snap, template)
    np.testing.assert_array_equal(np.asarray(out["w"]), np.asarray(tree["w"]))
    np.testing.assert_array_equal(np.asarray(out["b"]), np.asarray(tree["b"]))
