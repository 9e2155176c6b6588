"""Bundled (lax.scan) stepping composed with device-resident data for
stages 1 and 3 — the TPU-first answer to per-step host dispatch latency
(the reference's Lightning loop dispatches every step; SURVEY.md §3).

Because batch indices and dropout keys both derive from state.step INSIDE
the step (runner.device_epoch_indices, stage1.py/stage3.py fold_in), a
K-bundled scan consumes the same batches with the same rngs as the
unbundled run: same step count, a tail of single steps covering
max_steps % K. Exact step-for-step equality of the SAME compiled program
under scan vs sequential dispatch is pinned separately in
test_device_data.py; these tests guard the runner WIRING (indices, tail,
stride accounting), where a real bug (wrong epoch, skipped or doubled
steps) shifts the training-loss trajectory by orders of magnitude more
than compiled-program float reassociation does. Assertions therefore
target (a) the exact final step count, (b) the final-step train metrics
(identical batches => identical losses up to per-op rounding), and (c) a
global relative-L2 param check — NOT leaf-wise tight equality, because
the scanned body and the standalone jit are different XLA programs whose
~1e-7 per-op differences get amplified through AdamW's rsqrt on
near-zero-gradient leaves (observed: a 4-element leaf of magnitude ~1e-3
moving ~4e-3 apart over 8 steps while the loss stays equal to 4 dp).
"""

import pytest

pytestmark = pytest.mark.slow

import os

import numpy as np


class CaptureLogger:
    """RunLogger stand-in recording every log_metrics call."""

    def __init__(self):
        self.rows = []

    def log_metrics(self, metrics, step):
        self.rows.append((step, dict(metrics)))

    def final_train(self):
        rows = [m for s, m in self.rows
                if any(k.startswith("train/") for k in m)]
        return rows[-1]


def _global_rel_l2(a_leaves, b_leaves):
    num = 0.0
    den = 0.0
    for x1, x2 in zip(a_leaves, b_leaves):
        x1 = np.asarray(x1, dtype=np.float64).ravel()
        x2 = np.asarray(x2, dtype=np.float64).ravel()
        num += float(((x1 - x2) ** 2).sum())
        den += float((x1**2).sum())
    return (num / max(den, 1e-30)) ** 0.5

from tvqvae_tpu.config import Config
from tvqvae_tpu.data import get_data, make_synthetic_trajectories, save_npz
from tvqvae_tpu.train import runner
from tvqvae_tpu.utils.checkpoint import load_checkpoint


def tiny_cfg():
    return Config.from_dict(
        {
            "dataset": {"batch_sizes": {"stage1": 8, "stage3": 8}},
            "exp_params": {"lr": 2e-3, "linear_warmup_rate": 0.1},
            "trainer_params": {
                "max_steps": {"stage1": 8, "stage3": 8},
                "val_check_interval": {"stage1": 100, "stage3": 100},
            },
            "encoder": {"init_dim": 4, "hid_dim": 16, "n_resnet_blocks": 1,
                        "downsampled_width": {"lf": 4, "hf": 8}},
            "decoder": {"n_resnet_blocks": 1},
            "VQ-VAE": {"n_fft": 4, "codebook_sizes": {"lf": 8, "hf": 8}},
            "fidelity_enhancer": {"dim": 8, "dim_mults": [1, 2],
                                  "resnet_block_groups": 4, "dropout": 0.0},
        }
    )


@pytest.fixture(scope="module")
def tiny_data(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bundled13")
    X, y = make_synthetic_trajectories(n=24, channels=2, length=64)
    data_path = str(tmp / "d.npz")
    save_npz(data_path, X, y)
    return get_data(data_path, ["a", "b"])


def _leaves(path):
    tree, _ = load_checkpoint(path)
    import jax

    return jax.tree.leaves(tree)


def test_stage1_bundled_matches_unbundled(tiny_data, tmp_path):
    cfg = tiny_cfg()
    p_ref = str(tmp_path / "s1_ref")
    p_b = str(tmp_path / "s1_b")
    log_ref, log_b = CaptureLogger(), CaptureLogger()
    # 8 steps unbundled vs bundle=3 (2 bundles + 2-step tail)
    runner.train_stage1(cfg, tiny_data, p_ref, log_ref, max_steps=8)
    runner.train_stage1(cfg, tiny_data, p_b, log_b, max_steps=8,
                        bundle_steps=3)
    ta, _ = load_checkpoint(p_ref)
    tb, _ = load_checkpoint(p_b)
    assert int(np.asarray(ta["step"])) == 8
    assert int(np.asarray(tb["step"])) == 8
    # tail runs single steps 7-8, so the final logged train metrics come
    # from the same batch in both runs; a wiring bug (wrong epoch index,
    # skipped tail) moves early-training losses at the 1e-1 scale.
    m_ref, m_b = log_ref.final_train(), log_b.final_train()
    for k in m_ref:
        if k.startswith("train/") and "loss" in k:
            np.testing.assert_allclose(m_b[k], m_ref[k], rtol=5e-3,
                                       err_msg=k)
    import jax

    a = jax.tree.leaves(ta)
    b = jax.tree.leaves(tb)
    assert len(a) == len(b)
    assert _global_rel_l2(a, b) < 1e-2


def test_stage3_bundled_matches_unbundled(tiny_data, tmp_path):
    cfg = tiny_cfg()
    p1 = str(tmp_path / "s1")
    runner.train_stage1(cfg, tiny_data, p1, max_steps=4)
    p_ref = str(tmp_path / "s3_ref")
    p_b = str(tmp_path / "s3_b")
    log_ref, log_b = CaptureLogger(), CaptureLogger()
    runner.train_stage3(cfg, tiny_data, p1, p_ref, log_ref, max_steps=8)
    runner.train_stage3(cfg, tiny_data, p1, p_b, log_b, max_steps=8,
                        bundle_steps=3)
    ta, _ = load_checkpoint(p_ref)
    tb, _ = load_checkpoint(p_b)
    assert int(np.asarray(ta["step"])) == 8
    assert int(np.asarray(tb["step"])) == 8
    m_ref, m_b = log_ref.final_train(), log_b.final_train()
    for k in m_ref:
        if k.startswith("train/") and "loss" in k:
            np.testing.assert_allclose(m_b[k], m_ref[k], rtol=5e-3,
                                       err_msg=k)
    import jax

    assert _global_rel_l2(jax.tree.leaves(ta), jax.tree.leaves(tb)) < 1e-2
