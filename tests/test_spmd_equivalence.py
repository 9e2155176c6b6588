"""Multi-device == single-device numerical equivalence (VERDICT r2 item 4).

The 8-way sharded step must produce the SAME new state as the 1-device step
on the same batch — that equality IS the psum-correctness claim for the VQ
codebook EMA statistics (the reference's only distributed touchpoint,
timevqvae/models/vq.py:155,229,234) and for the gradient all-reduce GSPMD
inserts over the sharded batch axis. Runs on the 8-virtual-CPU-device mesh
from conftest.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tvqvae_tpu.config import Config
from tvqvae_tpu.models import Stage1Spec, init_stage1
from tvqvae_tpu.models.maskgit import FrozenStage1, MaskGITSpec, build_transformers
from tvqvae_tpu.parallel import make_mesh, replicate_tree, shard_batch
from tvqvae_tpu.train import make_stage1_train_step
from tvqvae_tpu.train.stage1 import create_stage1_state
from tvqvae_tpu.train.stage2 import (

    create_stage2_state,
    init_stage2,
    make_stage2_train_step,
)

# heavy big-compile/mesh tests: slow tier (round-5 fast-tier
# budget, VERDICT r4 next-6 — `make test` still runs them)
pytestmark = pytest.mark.slow



def tiny_cfg():
    return Config.from_dict(
        {
            "encoder": {"init_dim": 4, "hid_dim": 16, "n_resnet_blocks": 1,
                        "downsampled_width": {"lf": 4, "hf": 8}},
            "decoder": {"n_resnet_blocks": 1},
            "VQ-VAE": {"n_fft": 4, "codebook_sizes": {"lf": 8, "hf": 8}},
            "MaskGIT": {
                "choice_temperatures": {"lf": 10, "hf": 4},
                "T": {"lf": 4, "hf": 1},
                "cfg_scale": 1.0,
                "prior_model_l": {"hidden_dim": 16, "n_layers": 1, "heads": 2,
                                  "ff_mult": 1, "use_rmsnorm": True,
                                  "p_unconditional": 0.2,
                                  "model_dropout": 0.0, "emb_dropout": 0.0},
                "prior_model_h": {"hidden_dim": 16, "n_layers": 1, "heads": 1,
                                  "ff_mult": 1, "use_rmsnorm": True,
                                  "p_unconditional": 0.2,
                                  "model_dropout": 0.0, "emb_dropout": 0.0},
            },
        }
    )


def _tree_close(a, b, rtol=2e-4, atol=1e-5):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64),
            rtol=rtol, atol=atol,
        )


@pytest.fixture(scope="module")
def stage1_setup():
    cfg = tiny_cfg()
    L, C, B = 96, 2, 16
    s1 = Stage1Spec.from_config(cfg, L, C)
    x = np.asarray(
        jax.random.normal(jax.random.key(0), (B, C, L)) * 0.3, np.float32
    )
    model, params, batch_stats, vq_l, vq_h = init_stage1(
        jax.random.key(1), s1, jnp.asarray(x)
    )
    # SGD, not adamw: the update must be LINEAR in the gradient for this
    # equivalence test. Conv biases that feed BatchNorm have analytically
    # ZERO training-loss gradient (BN subtracts the batch mean), so their
    # computed grads are pure reduction noise (~1e-7) whose SIGN can differ
    # between mesh layouts — and adam's step-1 update g/(sqrt(g^2)+eps)
    # amplifies any sign flip to a full +-lr. That is an optimizer
    # degeneracy shared with the reference (torch adam on the same
    # conv+BN), not a psum bug; grads themselves are asserted equal via
    # the sgd update (update = lr*g).
    tx = optax.sgd(1e-2)
    state = create_stage1_state(params, batch_stats, vq_l, vq_h, tx)
    # host copy so each mesh run starts from identical state (donation-safe)
    state_np = jax.tree.map(np.asarray, state)
    return cfg, s1, model, tx, state_np, x


def _run_stage1_on_mesh(n_dev, model, tx, state_np, x):
    mesh = make_mesh(n_dev)
    state = replicate_tree(mesh, jax.tree.map(jnp.asarray, state_np))
    xs = shard_batch(mesh, jnp.asarray(x))
    step = jax.jit(make_stage1_train_step(model, tx), donate_argnums=0)
    state, metrics = step(state, xs, jax.random.key(5))
    return (
        jax.tree.map(np.asarray, state),
        {k: float(v) for k, v in metrics.items()},
    )


def test_stage1_step_8dev_equals_1dev(stage1_setup):
    assert len(jax.devices()) >= 8, "conftest must provision 8 CPU devices"
    cfg, s1, model, tx, state_np, x = stage1_setup
    s1_1, m1 = _run_stage1_on_mesh(1, model, tx, state_np, x)
    s1_8, m8 = _run_stage1_on_mesh(8, model, tx, state_np, x)

    for k in m1:
        assert np.isclose(m1[k], m8[k], rtol=2e-4, atol=1e-5), (
            f"metric {k}: 1-dev {m1[k]} vs 8-dev {m8[k]}"
        )
    _tree_close(s1_1.params, s1_8.params)
    # the psum path proper: codebook EMA statistics must agree exactly up
    # to reduction reordering (reference vq.py:229,234 all_reduce points)
    for band in ("vq_l", "vq_h"):
        a, b = getattr(s1_1, band), getattr(s1_8, band)
        _tree_close(a.cluster_size, b.cluster_size)
        _tree_close(a.embed_avg, b.embed_avg, atol=5e-5)
        _tree_close(a.embed, b.embed, atol=5e-5)
    # BN batch statistics are batch-axis reductions -> also psum-dependent
    _tree_close(s1_1.batch_stats, s1_8.batch_stats)


def test_stage2_step_8dev_equals_1dev(stage1_setup):
    cfg, s1, model, tx, state_np, x = stage1_setup
    spec = MaskGITSpec.from_config(cfg, s1)
    t_l, t_h = build_transformers(cfg, s1, n_classes=3)
    p2, h_stats = init_stage2(jax.random.key(2), t_l, t_h, spec)
    tx2 = optax.sgd(1e-2)  # linear in grad — see stage1_setup comment
    s2_np = jax.tree.map(np.asarray, create_stage2_state(p2, h_stats, tx2))
    y = np.zeros((len(x), 1), np.int32)

    frozen_np = {
        "params": jax.tree.map(np.asarray, state_np.params),
        "batch_stats": jax.tree.map(np.asarray, state_np.batch_stats),
    }

    def run(n_dev):
        mesh = make_mesh(n_dev)
        frozen = replicate_tree(
            mesh,
            FrozenStage1(
                params=jax.tree.map(jnp.asarray, frozen_np["params"]),
                batch_stats=jax.tree.map(
                    jnp.asarray, frozen_np["batch_stats"]
                ),
                vq_l=jax.tree.map(jnp.asarray, state_np.vq_l),
                vq_h=jax.tree.map(jnp.asarray, state_np.vq_h),
            ),
        )
        st = replicate_tree(mesh, jax.tree.map(jnp.asarray, s2_np))
        xs, ys = shard_batch(mesh, (jnp.asarray(x), jnp.asarray(y)))
        step = jax.jit(
            make_stage2_train_step(model, t_l, t_h, spec, tx2),
            donate_argnums=0,
        )
        st, m = step(st, frozen, xs, ys, jax.random.key(6))
        return jax.tree.map(np.asarray, st), {
            k: float(v) for k, v in m.items()
        }

    st1, m1 = run(1)
    st8, m8 = run(8)
    for k in m1:
        assert np.isclose(m1[k], m8[k], rtol=2e-4, atol=1e-5), (
            f"metric {k}: 1-dev {m1[k]} vs 8-dev {m8[k]}"
        )
    _tree_close(st1.params, st8.params)


def test_stage1_step_8dev_equals_1dev_fast_bn(stage1_setup):
    """Same equivalence under --fast_bn: the fast BatchNorm's fp32-
    accumulated batch statistics are batch-axis reductions too, so GSPMD
    must insert the same cross-shard means; params/EMA/batch_stats must
    agree between mesh sizes (tests the lever's SPMD semantics)."""
    import dataclasses

    from tvqvae_tpu.models.stage1 import Stage1Model

    cfg, s1, _model, tx, state_np, x = stage1_setup
    model = Stage1Model(dataclasses.replace(s1, fast_bn=True))
    s_1, m1 = _run_stage1_on_mesh(1, model, tx, state_np, x)
    s_8, m8 = _run_stage1_on_mesh(8, model, tx, state_np, x)
    for k in m1:
        assert np.isclose(m1[k], m8[k], rtol=2e-4, atol=1e-5), (
            f"metric {k}: 1-dev {m1[k]} vs 8-dev {m8[k]}"
        )
    _tree_close(s_1.params, s_8.params)
    _tree_close(s_1.batch_stats, s_8.batch_stats)
