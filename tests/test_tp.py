"""Tensor-parallel (2-D data x model mesh) correctness.

The TP rule (parallel/tp.py) shards big parameter leaves over `model` and
lets GSPMD partition the unchanged jitted train step. These tests assert,
on the 8-virtual-CPU-device mesh from conftest.py, that

  1. the sharding rule engages (parameter bytes actually split over
     `model`, committed shardings inspected post-step), and
  2. the TP-sharded step is NUMERICALLY EQUAL to the 1-device step — the
     proof that XLA's inserted all-gathers/reduce-scatters implement the
     same math, exactly as test_spmd_equivalence.py proves it for the
     data axis.

Uses SGD for the equivalence legs for the same reason as
test_spmd_equivalence.py: the update must be linear in the gradient
(BN-fed conv biases have analytically-zero grads whose reduction-noise
sign flips adam would amplify to +-lr).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from tvqvae_tpu.models import Stage1Spec, init_stage1
from tvqvae_tpu.models.maskgit import FrozenStage1, MaskGITSpec, build_transformers
from tvqvae_tpu.parallel import make_mesh, replicate_tree, shard_batch
from tvqvae_tpu.parallel.tp import (
    make_mesh2d,
    replicate_tree2d,
    shard_batch2d,
    shard_params_tp,
    sharded_fraction,
    tp_leaf_spec,
)
from tvqvae_tpu.train import make_stage1_train_step
from tvqvae_tpu.train.stage1 import create_stage1_state
from tvqvae_tpu.train.stage2 import (
    create_stage2_state,
    init_stage2,
    make_stage2_train_step,
)

from test_spmd_equivalence import tiny_cfg

# heavy big-compile/mesh tests: slow tier (round-5 fast-tier
# budget, VERDICT r4 next-6 — `make test` still runs them)
pytestmark = pytest.mark.slow



# tiny-geometry leaves are far below the production MIN_SHARD_ELEMS floor;
# drop it so the rule engages in tests
TEST_MIN_ELEMS = 512


def test_tp_leaf_spec_rules():
    # Dense kernel (in, out): trailing (output) axis wins the tie
    assert tp_leaf_spec(np.zeros((64, 64)), 2, 512) == P(None, "model")
    # conv HWIO: largest divisible axis; trailing wins ties
    assert tp_leaf_spec(np.zeros((3, 4, 16, 64)), 2, 512) == \
        P(None, None, None, "model")
    # below the size floor: replicated
    assert tp_leaf_spec(np.zeros((8, 8)), 2, 512) == P()
    # nothing divisible: replicated
    assert tp_leaf_spec(np.zeros((33, 65)), 2, 32) == P()
    # scalar
    assert tp_leaf_spec(np.zeros(()), 2, 0) == P()


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
    tx = optax.sgd(1e-2)
    parts = (params, batch_stats, vq_l, vq_h)
    parts_np = jax.tree.map(np.asarray, parts)
    return model, tx, parts_np, x


def _run_step(model, tx, parts_np, x, mesh2d=None):
    """One SGD stage-1 step; TP-sharded on mesh2d, else on a 1-dev mesh."""
    params, batch_stats, vq_l, vq_h = jax.tree.map(jnp.asarray, parts_np)
    if mesh2d is None:
        mesh = make_mesh(1, jax.devices()[:1])
        state = replicate_tree(
            mesh, create_stage1_state(params, batch_stats, vq_l, vq_h, tx)
        )
        xb = shard_batch(mesh, x)
    else:
        params = shard_params_tp(mesh2d, params, TEST_MIN_ELEMS)
        state = create_stage1_state(params, batch_stats, vq_l, vq_h, tx)
        state = state.replace(
            batch_stats=replicate_tree2d(mesh2d, state.batch_stats),
            vq_l=replicate_tree2d(mesh2d, state.vq_l),
            vq_h=replicate_tree2d(mesh2d, state.vq_h),
        )
        xb = shard_batch2d(mesh2d, x)
    step = jax.jit(make_stage1_train_step(model, tx), donate_argnums=0)
    state, metrics = step(state, xb, jax.random.key(0))
    return state, float(metrics["loss"])


@pytest.mark.parametrize("n_data,n_model", [(2, 2), (2, 4), (4, 2)])
def test_stage1_tp_equals_single_device(stage1_setup, n_data, n_model):
    model, tx, parts_np, x = stage1_setup
    mesh2d = make_mesh2d(n_data, n_model)

    # the rule must actually shard something before the step runs
    params_tp = shard_params_tp(
        mesh2d, jax.tree.map(jnp.asarray, parts_np[0]), TEST_MIN_ELEMS
    )
    frac = sharded_fraction(params_tp)
    assert frac > 0.25, f"TP rule engaged on only {frac:.0%} of param bytes"

    st_tp, loss_tp = _run_step(model, tx, parts_np, x, mesh2d)
    st_1, loss_1 = _run_step(model, tx, parts_np, x, None)
    assert np.isclose(loss_tp, loss_1, rtol=2e-4, atol=1e-5)

    for a, b in zip(jax.tree.leaves(st_tp.params),
                    jax.tree.leaves(st_1.params)):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64),
            rtol=2e-4, atol=1e-5,
        )
    # the VQ EMA psum path must agree too
    for band in ("vq_l", "vq_h"):
        for field in ("cluster_size", "embed_avg", "embed"):
            a = np.asarray(getattr(getattr(st_tp, band), field), np.float64)
            b = np.asarray(getattr(getattr(st_1, band), field), np.float64)
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)


def test_stage1_params_stay_sharded_after_step(stage1_setup):
    """Donation + GSPMD must not silently gather the params back to
    replicated: the committed POST-step sharding still splits over model."""
    model, tx, parts_np, x = stage1_setup
    mesh2d = make_mesh2d(2, 2)
    st_tp, _ = _run_step(model, tx, parts_np, x, mesh2d)
    frac = sharded_fraction(st_tp.params)
    assert frac > 0.25, (
        f"post-step params only {frac:.0%} model-sharded — GSPMD "
        "re-replicated the TP weights"
    )


@pytest.mark.slow
def test_runner_train_stage1_tp(tmp_path, monkeypatch):
    """CLI-reachable TP (train_stage1(tp=2), the `--tp` flag's path): a
    short run over the 2-D (4, 2) mesh trains, checkpoints, and resumes.
    Drops the size floor so the tiny test geometry actually shards."""
    from tvqvae_tpu.data import get_data, make_synthetic_trajectories, save_npz
    from tvqvae_tpu.parallel import tp as tp_mod
    from tvqvae_tpu.train import runner
    from tvqvae_tpu.utils.checkpoint import load_checkpoint

    monkeypatch.setattr(tp_mod, "MIN_SHARD_ELEMS", 512)
    X, y = make_synthetic_trajectories(n=48, channels=2, length=64)
    data_path = str(tmp_path / "d.npz")
    save_npz(data_path, X, y)
    data = get_data(data_path, ["a", "b"])

    cfg = tiny_cfg()
    # 48*0.9 = 43 train samples; the default stage-1 batch of 32 must fit
    cfg.dataset.batch_sizes["stage1"] = 8
    # a val boundary inside the run covers the full-split eval + snapshot
    # paths under TP placements too
    cfg.trainer_params.val_check_interval["stage1"] = 4
    p1 = str(tmp_path / "stage1")
    runner.train_stage1(cfg, data, p1, max_steps=8, tp=2)
    tree, meta = load_checkpoint(p1)
    assert int(np.asarray(tree["step"])) == 8
    assert np.isfinite(
        np.asarray(jax.tree.leaves(tree["params"])[0])
    ).all()
    # resume path goes through _place_state too
    runner.train_stage1(cfg, data, p1, max_steps=12, tp=2)
    tree, _ = load_checkpoint(p1)
    assert int(np.asarray(tree["step"])) == 12


def test_make_train_mesh_tp_validation():
    from tvqvae_tpu.train.runner import _make_train_mesh

    mesh = _make_train_mesh(2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    with pytest.raises(AssertionError):
        _make_train_mesh(3)  # 8 devices not divisible
    assert tuple(_make_train_mesh(1).axis_names) == ("data",)


def test_stage2_tp_step(stage1_setup):
    """Transformer-prior step with TP-sharded prior params over (2, 2):
    finite loss and equality with the 1-device step."""
    cfg = tiny_cfg()
    model, _, parts_np, x = stage1_setup
    params, batch_stats, vq_l, vq_h = jax.tree.map(jnp.asarray, parts_np)

    spec2 = MaskGITSpec.from_config(cfg, model.spec)
    t_l, t_h = build_transformers(cfg, model.spec, n_classes=3)
    p2, h_stats = init_stage2(jax.random.key(5), t_l, t_h, spec2)
    p2_np = jax.tree.map(np.asarray, p2)
    h_np = jax.tree.map(np.asarray, h_stats)
    tx2 = optax.sgd(1e-2)
    y = np.zeros((x.shape[0], 1), np.int32)

    def run(mesh2d):
        pp = jax.tree.map(jnp.asarray, p2_np)
        hh = jax.tree.map(jnp.asarray, h_np)
        if mesh2d is None:
            mesh = make_mesh(1, jax.devices()[:1])
            frozen = replicate_tree(mesh, FrozenStage1(
                params=params, batch_stats=batch_stats,
                vq_l=vq_l, vq_h=vq_h))
            s2 = replicate_tree(mesh, create_stage2_state(pp, hh, tx2))
            xb, yb = shard_batch(mesh, (x, y))
        else:
            frozen = replicate_tree2d(mesh2d, FrozenStage1(
                params=params, batch_stats=batch_stats,
                vq_l=vq_l, vq_h=vq_h))
            pp = shard_params_tp(mesh2d, pp, TEST_MIN_ELEMS)
            s2 = create_stage2_state(pp, hh, tx2)
            s2 = s2.replace(h_stats=replicate_tree2d(mesh2d, s2.h_stats))
            xb, yb = shard_batch2d(mesh2d, (x, y))
        step2 = jax.jit(
            make_stage2_train_step(model, t_l, t_h, spec2, tx2),
            donate_argnums=0,
        )
        s2, m2 = step2(s2, frozen, xb, yb, jax.random.key(7))
        return jax.tree.map(np.asarray, s2.params), float(m2["loss"])

    p_tp, loss_tp = run(make_mesh2d(2, 2))
    p_1, loss_1 = run(None)
    assert np.isfinite(loss_tp)
    assert np.isclose(loss_tp, loss_1, rtol=2e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(p_tp), jax.tree.leaves(p_1)):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64),
            rtol=2e-4, atol=1e-5,
        )
