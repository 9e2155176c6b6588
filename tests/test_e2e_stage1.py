"""End-to-end stage-1 smoke training on the virtual 8-device CPU mesh.

The de-facto integration test the reference lacks (SURVEY.md §4): a tiny
synthetic dataset trains for a few dozen jitted SPMD steps; reconstruction
loss must drop and codebooks must move. Exercises the full stack:
data -> scaling -> sharded batches -> STFT conv -> encoders -> VQ EMA ->
decoders -> losses -> AdamW -> state threading.
"""

import pytest

pytestmark = pytest.mark.slow

import numpy as np

import jax
import jax.numpy as jnp
import optax

from tvqvae_tpu.config import Config
from tvqvae_tpu.data import get_data, make_batches, make_synthetic_trajectories, save_npz
from tvqvae_tpu.models import Stage1Spec, init_stage1
from tvqvae_tpu.parallel import make_mesh, replicate_tree, shard_batch
from tvqvae_tpu.train import make_stage1_train_step, make_stage1_eval_step
from tvqvae_tpu.train.stage1 import create_stage1_state
from tvqvae_tpu.utils import warmup_cosine_schedule


def test_stage1_trains_and_improves(tmp_path):
    X, y = make_synthetic_trajectories(n=64, channels=2, length=96)
    path = str(tmp_path / "tiny.npz")
    save_npz(path, X, y)
    data = get_data(path, ["a", "b"])
    assert data.X_train.shape[0] == 57 and data.X_test.shape[0] == 7
    assert data.X_train.min() >= -1.0001 and data.X_train.max() <= 1.0001

    cfg = Config.from_dict(
        {
            "encoder": {
                "init_dim": 4, "hid_dim": 16, "n_resnet_blocks": 1,
                "downsampled_width": {"lf": 4, "hf": 8},
            },
            "decoder": {"n_resnet_blocks": 1},
            "VQ-VAE": {"n_fft": 4, "codebook_sizes": {"lf": 8, "hf": 8}},
            "exp_params": {"lr": 3e-3, "linear_warmup_rate": 0.1},
        }
    )
    spec = Stage1Spec.from_config(cfg, data.input_length, data.in_channels)

    mesh = make_mesh()
    assert mesh.devices.size == 8  # virtual CPU mesh from conftest

    batch = data.X_train[:16]
    model, params, batch_stats, vq_l, vq_h = init_stage1(
        jax.random.key(0), spec, jnp.asarray(batch)
    )
    tx = optax.adamw(warmup_cosine_schedule(3e-3, 200), weight_decay=0.01)
    state = create_stage1_state(params, batch_stats, vq_l, vq_h, tx)
    state = replicate_tree(mesh, state)

    train_step = jax.jit(make_stage1_train_step(model, tx), donate_argnums=0)
    eval_step = jax.jit(make_stage1_eval_step(model))

    rng = jax.random.key(1)
    losses = []
    batches = make_batches(
        data.X_train, data.y_train, 16, shuffle=True, seed=0, repeat=True
    )
    for i in range(40):
        xb, _ = next(batches)
        xb = shard_batch(mesh, jnp.asarray(xb))
        state, metrics = train_step(state, xb, rng)
        losses.append(float(metrics["loss"]))

    assert np.isfinite(losses).all()
    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    assert last < first * 0.8, (first, last)

    # eval pass on held-out data
    xe = shard_batch(mesh, jnp.asarray(np.repeat(data.X_test, 2, axis=0)[:8]))
    metrics, out = eval_step(state, xe)
    assert np.isfinite(float(metrics["loss"]))
    assert out.xhat_l.shape == xe.shape

    # codebooks were actually trained (moved + utilized)
    assert float(metrics["perplexity.LF"]) > 1.0

    # per-sample eval mode (runner full-val-split averaging) agrees with the
    # batch-mean metrics on the same batch
    eval_ps = jax.jit(make_stage1_eval_step(model, per_sample=True))
    per, scalars, _ = eval_ps(state, xe)
    assert per["recons_loss.LF.time"].shape == (8,)
    np.testing.assert_allclose(
        float(jnp.mean(per["recons_loss.LF.time"])),
        float(metrics["recons_loss.LF.time"]), rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(jnp.mean(per["recons_loss.HF.time"])),
        float(metrics["recons_loss.HF.time"]), rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(scalars["perplexity.LF"]), float(metrics["perplexity.LF"]),
        rtol=1e-5,
    )
