"""Mid-stage checkpoint/resume: a capability the reference lacks
(SURVEY.md §5.4 — enable_checkpointing=False, no restarts)."""

import pytest

pytestmark = pytest.mark.slow

import os

import numpy as np

from tvqvae_tpu.config import Config
from tvqvae_tpu.data import get_data, make_synthetic_trajectories, save_npz
from tvqvae_tpu.train import runner
from tvqvae_tpu.utils.checkpoint import load_train_state, save_train_state


def tiny_cfg(val_interval=4):
    return Config.from_dict(
        {
            "dataset": {"batch_sizes": {"stage1": 8}},
            "exp_params": {"lr": 2e-3, "linear_warmup_rate": 0.1},
            "trainer_params": {
                "max_steps": {"stage1": 8},
                "val_check_interval": {"stage1": val_interval},
            },
            "encoder": {"init_dim": 4, "hid_dim": 16, "n_resnet_blocks": 1,
                        "downsampled_width": {"lf": 4, "hf": 8}},
            "decoder": {"n_resnet_blocks": 1},
            "VQ-VAE": {"n_fft": 4, "codebook_sizes": {"lf": 8, "hf": 8}},
        }
    )


def test_train_state_snapshot_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    import optax

    from tvqvae_tpu.models import Stage1Spec, init_stage1
    from tvqvae_tpu.train.stage1 import create_stage1_state

    cfg = tiny_cfg()
    spec = Stage1Spec.from_config(cfg, 64, 2)
    x = jnp.zeros((4, 2, 64))
    _, params, bs, vq_l, vq_h = init_stage1(jax.random.key(0), spec, x)
    tx = optax.adamw(1e-3)
    state = create_stage1_state(params, bs, vq_l, vq_h, tx)

    path = str(tmp_path / "snap.train")
    save_train_state(path, state)
    template = create_stage1_state(params, bs, vq_l, vq_h, tx)
    restored = load_train_state(path, template)
    a = jax.tree.leaves(state)
    b = jax.tree.leaves(restored)
    assert len(a) == len(b)
    for x1, x2 in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


def test_stage1_resume_continues(tmp_path):
    X, y = make_synthetic_trajectories(n=24, channels=2, length=64)
    data_path = str(tmp_path / "d.npz")
    save_npz(data_path, X, y)
    data = get_data(data_path, ["a", "b"])

    p1 = str(tmp_path / "stage1")
    # first run: 8 steps, snapshots at 4 and 8
    cfg = tiny_cfg(val_interval=4)
    runner.train_stage1(cfg, data, p1, max_steps=8)
    assert os.path.exists(p1 + ".train")

    # second run with a larger budget resumes from the last MID-RUN
    # snapshot (step 4 — the final boundary intentionally does not
    # snapshot; see runner.py) instead of restarting from scratch
    runner.train_stage1(cfg, data, p1, max_steps=12)
    from tvqvae_tpu.utils.checkpoint import load_checkpoint

    tree, _ = load_checkpoint(p1)
    assert int(np.asarray(tree["step"])) == 12


def test_stage1_completed_stage_skips(tmp_path, capsys):
    """Re-invoking a COMPLETED stage returns immediately via the meta's
    completed_step (idempotency for chipqueue/full_run re-runs) instead of
    retraining from the last mid-run snapshot."""
    X, y = make_synthetic_trajectories(n=24, channels=2, length=64)
    data_path = str(tmp_path / "d.npz")
    save_npz(data_path, X, y)
    data = get_data(data_path, ["a", "b"])

    p1 = str(tmp_path / "stage1")
    cfg = tiny_cfg(val_interval=4)
    runner.train_stage1(cfg, data, p1, max_steps=8)
    import json

    with open(p1 + ".meta.json") as f:
        assert json.load(f)["completed_step"] == 8

    mtime = os.path.getmtime(p1 + ".meta.json")
    capsys.readouterr()
    out_path = runner.train_stage1(cfg, data, p1, max_steps=8)
    assert out_path == p1
    assert "skipping" in capsys.readouterr().out
    assert os.path.getmtime(p1 + ".meta.json") == mtime  # untouched
