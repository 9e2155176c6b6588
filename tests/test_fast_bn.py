"""Fast BatchNorm (compute-dtype normalization, fp32-accumulated stats).

The traffic lever for the stage-1 memory-bound step (PERF.md roofline: flax
BN's fp32 promotion materializes ~228 MB fp32 activations per BN at the
published shapes). These tests pin:

  - exact drop-in semantics vs flax nn.BatchNorm on fp32 inputs (train and
    eval modes, running-stat updates),
  - close agreement with the legacy fp32-sandwich path on bf16 inputs
    (identical fp32-accumulated statistics; bf16-rounded normalization),
  - checkpoint-tree compatibility: identical param/batch_stats paths, so
    fast_bn toggles freely on existing checkpoints,
  - stage-1 train-step equivalence at fp32 (fast_bn ON == OFF numerically).

Reference BN semantics being preserved: torch BatchNorm2d defaults
(timevqvae/models/vq_vae.py:13-121) == flax momentum 0.9 / eps 1e-5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from tvqvae_tpu.models.layers import BatchNorm, batch_norm

# heavy big-compile/mesh tests: slow tier (round-5 fast-tier
# budget, VERDICT r4 next-6 — `make test` still runs them)
pytestmark = pytest.mark.slow



def _flax_bn(train):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5)


def _init_and_apply(mod, x, rng=0):
    v = mod.init(jax.random.key(rng), x)
    y, mut = mod.apply(v, x, mutable=["batch_stats"])
    return v, y, mut


def test_fast_bn_matches_flax_fp32_train():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3, 17, 8)) * 2.5,
                    jnp.float32)
    fast = BatchNorm(use_running_average=False)
    ref = _flax_bn(train=True)
    v_f, y_f, mut_f = _init_and_apply(fast, x)
    v_r, y_r, mut_r = _init_and_apply(ref, x)
    np.testing.assert_allclose(y_f, y_r, rtol=2e-5, atol=2e-5)
    for leaf in ("mean", "var"):
        np.testing.assert_allclose(
            mut_f["batch_stats"][leaf], mut_r["batch_stats"][leaf],
            rtol=1e-5, atol=1e-6,
        )


def test_fast_bn_matches_flax_fp32_eval():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 3, 17, 8)),
                    jnp.float32)
    stats = {
        "mean": jnp.asarray(np.random.default_rng(2).normal(size=(8,)),
                            jnp.float32),
        "var": jnp.asarray(
            np.random.default_rng(3).uniform(0.2, 2.0, size=(8,)),
            jnp.float32),
    }
    scale = jnp.asarray(np.random.default_rng(4).normal(size=(8,)),
                        jnp.float32)
    bias = jnp.asarray(np.random.default_rng(5).normal(size=(8,)),
                       jnp.float32)
    variables = {"params": {"scale": scale, "bias": bias},
                 "batch_stats": stats}
    y_f = BatchNorm(use_running_average=True).apply(variables, x)
    y_r = _flax_bn(train=False).apply(variables, x)
    np.testing.assert_allclose(y_f, y_r, rtol=2e-5, atol=2e-5)


def test_fast_bn_bf16_close_to_legacy_sandwich():
    """bf16 input: fast BN agrees with the legacy fp32-promotion path up to
    bf16 rounding of the normalized output; the fp32 running stats agree
    tightly (identical accumulation values, different reduce ordering)."""
    x = jnp.asarray(np.random.default_rng(6).normal(size=(8, 3, 33, 16)),
                    jnp.bfloat16)
    fast = BatchNorm(use_running_average=False)
    v_f, y_f, mut_f = _init_and_apply(fast, x)
    ref = _flax_bn(train=True)
    v_r = ref.init(jax.random.key(0), x.astype(jnp.float32))
    y_r, mut_r = ref.apply(v_r, x.astype(jnp.float32),
                           mutable=["batch_stats"])
    assert y_f.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y_f, np.float32), np.asarray(y_r, np.float32),
        rtol=5e-2, atol=5e-2,
    )
    for leaf in ("mean", "var"):
        np.testing.assert_allclose(
            mut_f["batch_stats"][leaf], mut_r["batch_stats"][leaf],
            rtol=1e-4, atol=1e-5,
        )


def test_batch_norm_factory_tree_paths_identical():
    """fast=True and fast=False produce the SAME variable tree (class name
    'BatchNorm' preserved), so checkpoints swap between implementations."""

    class Wrap(nn.Module):
        fast: bool

        @nn.compact
        def __call__(self, x):
            return batch_norm(train=True, fast=self.fast)(x)

    x = jnp.ones((2, 5, 4), jnp.float32)
    v_fast = Wrap(fast=True).init(jax.random.key(0), x)
    v_slow = Wrap(fast=False).init(jax.random.key(0), x)
    assert jax.tree_util.tree_structure(v_fast) == \
        jax.tree_util.tree_structure(v_slow)
    # param values also identical (ones/zeros init)
    for a, b in zip(jax.tree_util.tree_leaves(v_fast),
                    jax.tree_util.tree_leaves(v_slow)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("dtype", ["float32"])
def test_stage1_step_fast_bn_equivalent_fp32(dtype):
    """One stage-1 train step at tiny geometry: fast_bn ON == OFF at fp32
    (same params, same batch -> same loss/grads up to fusion reordering)."""
    import optax

    from tvqvae_tpu.config import Config
    from tvqvae_tpu.models import Stage1Spec, init_stage1
    from tvqvae_tpu.train import make_stage1_train_step
    from tvqvae_tpu.train.stage1 import create_stage1_state
    from tvqvae_tpu.utils import warmup_cosine_schedule

    cfg = Config.from_dict({
        "encoder": {"init_dim": 4, "hid_dim": 8, "n_resnet_blocks": 1,
                    "downsampled_width": {"lf": 4, "hf": 8}},
        "decoder": {"n_resnet_blocks": 1},
        "VQ-VAE": {"n_fft": 4, "codebook_sizes": {"lf": 8, "hf": 8}},
    })
    B, C, L = 2, 4, 64
    x = jnp.asarray(np.random.default_rng(7).normal(size=(B, C, L)),
                    jnp.float32)

    losses = {}
    for fast in (False, True):
        spec = Stage1Spec.from_config(cfg, L, C, compute_dtype=dtype,
                                      fast_bn=fast)
        model, params, batch_stats, vq_l, vq_h = init_stage1(
            jax.random.key(0), spec, x
        )
        tx = optax.adamw(warmup_cosine_schedule(1e-3, 100), weight_decay=0.01)
        state = create_stage1_state(params, batch_stats, vq_l, vq_h, tx)
        step = jax.jit(make_stage1_train_step(model, tx))
        state2, metrics = step(state, x, jax.random.key(1))
        losses[fast] = (jax.tree_util.tree_map(np.asarray, metrics),
                        state2)

    m_off, s_off = losses[False]
    m_on, s_on = losses[True]
    np.testing.assert_allclose(m_off["loss"], m_on["loss"],
                               rtol=1e-4, atol=1e-5)
    # updated params agree leaf-by-leaf
    for a, b in zip(jax.tree_util.tree_leaves(s_off.params),
                    jax.tree_util.tree_leaves(s_on.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


# ---------------------------------------------------------------------------
# fast GroupNorm (stage-3 analogue; models/layers.py GroupNorm)


def test_fast_group_norm_matches_flax_fp32():
    from tvqvae_tpu.models.layers import GroupNorm

    x = jnp.asarray(np.random.default_rng(8).normal(size=(3, 29, 16)) * 1.7,
                    jnp.float32)
    scale = jnp.asarray(np.random.default_rng(9).normal(size=(16,)),
                        jnp.float32)
    bias = jnp.asarray(np.random.default_rng(10).normal(size=(16,)),
                       jnp.float32)
    variables = {"params": {"scale": scale, "bias": bias}}
    y_f = GroupNorm(num_groups=4, epsilon=1e-5).apply(variables, x)
    y_r = nn.GroupNorm(num_groups=4, epsilon=1e-5).apply(variables, x)
    np.testing.assert_allclose(y_f, y_r, rtol=3e-5, atol=3e-5)


def test_fast_group_norm_bf16_close():
    from tvqvae_tpu.models.layers import GroupNorm

    x = jnp.asarray(np.random.default_rng(11).normal(size=(2, 33, 8)),
                    jnp.bfloat16)
    variables = GroupNorm(num_groups=2).init(jax.random.key(0), x)
    y_f = GroupNorm(num_groups=2, epsilon=1e-5).apply(variables, x)
    y_r = nn.GroupNorm(num_groups=2, epsilon=1e-5).apply(
        variables, x.astype(jnp.float32))
    assert y_f.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y_f, np.float32),
                               np.asarray(y_r, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_fe_fast_norm_equivalent_fp32():
    """FidelityEnhancer with fast_norm ON == OFF at fp32 (same params)."""
    from tvqvae_tpu.models.fidelity_enhancer import FidelityEnhancer

    x = jnp.asarray(np.random.default_rng(12).normal(size=(2, 4, 48)),
                    jnp.float32)
    fe_off = FidelityEnhancer(input_length=48, in_channels=4, dim=8,
                              dim_mults=(1, 2), resnet_block_groups=4,
                              dropout=0.0)
    fe_on = FidelityEnhancer(input_length=48, in_channels=4, dim=8,
                             dim_mults=(1, 2), resnet_block_groups=4,
                             dropout=0.0, fast_norm=True)
    v = fe_off.init(jax.random.key(0), x)
    v_on = fe_on.init(jax.random.key(0), x)
    # identical trees -> checkpoints swap between modes
    assert jax.tree_util.tree_structure(v) == \
        jax.tree_util.tree_structure(v_on)
    y_off = fe_off.apply(v, x, False)
    y_on = fe_on.apply(v, x, False)
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                               rtol=2e-4, atol=2e-5)
