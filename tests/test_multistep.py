"""Bundled stepping (make_stage1_train_multistep): a lax.scan of K training
steps must be bit-equivalent to K sequential make_stage1_train_step calls —
same params, codebook EMA state, BN stats, and optimizer state."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

pytestmark = pytest.mark.slow

from tvqvae_tpu.config import Config
from tvqvae_tpu.models import Stage1Spec, init_stage1
from tvqvae_tpu.train.stage1 import (
    create_stage1_state,
    make_stage1_train_multistep,
    make_stage1_train_step,
)
from tvqvae_tpu.utils import warmup_cosine_schedule

K, B, C, L = 3, 8, 2, 128


@pytest.fixture(scope="module")
def setup():
    cfg = Config.from_dict(
        {
            "encoder": {
                "init_dim": 4, "hid_dim": 16, "n_resnet_blocks": 1,
                "downsampled_width": {"lf": 4, "hf": 8},
            },
            "decoder": {"n_resnet_blocks": 1},
            "VQ-VAE": {"n_fft": 4, "codebook_sizes": {"lf": 8, "hf": 8}},
        }
    )
    spec = Stage1Spec.from_config(cfg, L, C)
    xs = np.random.default_rng(0).normal(size=(K, B, C, L)).astype(np.float32)
    model, params, batch_stats, vq_l, vq_h = init_stage1(
        jax.random.key(0), spec, jnp.asarray(xs[0])
    )
    tx = optax.adamw(warmup_cosine_schedule(1e-3, 100), weight_decay=0.01)
    state = create_stage1_state(params, batch_stats, vq_l, vq_h, tx)
    return model, tx, state, jnp.asarray(xs)


def test_multistep_equals_sequential_steps(setup):
    model, tx, state0, xs = setup
    rng = jax.random.key(7)

    step = jax.jit(make_stage1_train_step(model, tx))
    seq = state0
    for i in range(K):
        seq, m_seq = step(seq, xs[i], rng)

    multi = jax.jit(make_stage1_train_multistep(model, tx, K))
    bun, m_bun = multi(state0, xs, rng)

    assert int(bun.step) == int(seq.step) == K
    # Same math, but the scan body and the standalone step compile to
    # differently-fused fp32 programs, so gradients differ at rounding
    # level and AdamW amplifies that near zero — compare at fp tolerance,
    # not bitwise.
    # The absolute floor covers gradient-degenerate leaves (conv biases
    # immediately followed by BatchNorm have ~zero true gradient, so their
    # ~1e-4 values are pure rounding noise in both runs).
    for a, b in zip(jax.tree.leaves(seq), jax.tree.leaves(bun)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(np.abs(a).max(), np.abs(b).max(), 1e-3)
        assert np.max(np.abs(a - b)) <= 1e-3 + 5e-3 * scale
    assert set(m_bun) == set(m_seq)
    for v in m_bun.values():
        assert np.isfinite(float(v))


def test_multistep_trains_in_runner(tmp_path):
    """Runner smoke with bundle_steps=2: loop stride, logging cadence, and
    checkpointing all work; loss is finite."""
    from tvqvae_tpu.data.dataset import DatasetSplits
    from tvqvae_tpu.train import runner

    rngn = np.random.default_rng(1)
    X = rngn.normal(size=(64, C, L)).astype(np.float32)
    data = DatasetSplits(
        X_train=X[:48], y_train=np.zeros((48, 1), np.int64),
        X_test=X[48:], y_test=np.zeros((16, 1), np.int64),
        scaler=None, n_classes=1,
    )
    cfg = Config.from_dict(
        {
            "dataset": {"batch_sizes": {"stage1": 8}},
            "trainer_params": {
                "max_steps": {"stage1": 6},
                "val_check_interval": {"stage1": 6},
            },
            "encoder": {
                "init_dim": 4, "hid_dim": 16, "n_resnet_blocks": 1,
                "downsampled_width": {"lf": 4, "hf": 8},
            },
            "decoder": {"n_resnet_blocks": 1},
            "VQ-VAE": {"n_fft": 4, "codebook_sizes": {"lf": 8, "hf": 8}},
        }
    )
    path = str(tmp_path / "stage1.ckpt")
    runner.train_stage1(cfg, data, path, logger=None, resume=False,
                        bundle_steps=2)
    import os

    assert os.path.exists(path)
