"""Rematerialized (checkpointed) conv stacks must be numerically equivalent
to the plain stacks: remat only changes the backward-pass recompute schedule
(an HBM-traffic lever on the memory-bound stage-1 step — PERF.md roofline),
never the math. Pins one full training step (fwd+bwd+AdamW+VQ EMA) with
`Stage1Spec.remat=True` against the default, from identical initial state on
identical batches."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tvqvae_tpu.config import Config
from tvqvae_tpu.models import Stage1Spec, init_stage1
from tvqvae_tpu.train.stage1 import create_stage1_state, make_stage1_train_step
from tvqvae_tpu.utils import warmup_cosine_schedule

# heavy big-compile/mesh tests: slow tier (round-5 fast-tier
# budget, VERDICT r4 next-6 — `make test` still runs them)
pytestmark = pytest.mark.slow


B, C, L = 8, 2, 128

CFG = {
    "encoder": {
        "init_dim": 4, "hid_dim": 16, "n_resnet_blocks": 1,
        "downsampled_width": {"lf": 4, "hf": 8},
    },
    "decoder": {"n_resnet_blocks": 1},
    "VQ-VAE": {"n_fft": 4, "codebook_sizes": {"lf": 8, "hf": 8}},
}


def _run_steps(remat: bool, xs, n_steps: int):
    cfg = Config.from_dict(CFG)
    spec = Stage1Spec.from_config(cfg, L, C, remat=remat)
    model, params, batch_stats, vq_l, vq_h = init_stage1(
        jax.random.key(0), spec, jnp.asarray(xs[0])
    )
    tx = optax.adamw(warmup_cosine_schedule(1e-3, 100), weight_decay=0.01)
    state = create_stage1_state(params, batch_stats, vq_l, vq_h, tx)
    step = jax.jit(make_stage1_train_step(model, tx))
    rng = jax.random.key(7)
    metrics = None
    for i in range(n_steps):
        state, metrics = step(state, jnp.asarray(xs[i]), rng)
    return state, metrics


@pytest.mark.slow
def test_remat_step_matches_plain():
    xs = np.random.default_rng(0).normal(size=(2, B, C, L)).astype(np.float32)
    plain, m_plain = _run_steps(False, xs, 2)
    remat, m_remat = _run_steps(True, xs, 2)

    # Identical init (same seeds, same param tree — remat is a lifted
    # transform, not a structural change), identical batches. The remat
    # backward compiles to a differently-fused program, so compare at fp
    # tolerance like test_multistep does, not bitwise.
    pl, rl = jax.tree.leaves(plain), jax.tree.leaves(remat)
    assert len(pl) == len(rl)
    for a, b in zip(pl, rl):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(np.abs(a).max(), np.abs(b).max(), 1e-3)
        assert np.max(np.abs(a - b)) <= 1e-3 + 5e-3 * scale
    for k in m_plain:
        assert np.isfinite(float(m_remat[k]))
        assert abs(float(m_plain[k]) - float(m_remat[k])) <= (
            1e-4 + 1e-3 * abs(float(m_plain[k]))
        )


def test_remat_param_tree_identical():
    """remat must not change the param/batch_stats tree structure — the
    checkpoints stay interchangeable between the two modes."""
    cfg = Config.from_dict(CFG)
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(B, C, L)), jnp.float32
    )
    trees = []
    for remat in (False, True):
        spec = Stage1Spec.from_config(cfg, L, C, remat=remat)
        _, params, batch_stats, _, _ = init_stage1(jax.random.key(0), spec, x)
        trees.append((jax.tree.structure(params),
                      jax.tree.structure(batch_stats)))
    assert trees[0] == trees[1]
