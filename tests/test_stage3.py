"""Fidelity-enhancer U-Net shape tests + stage-3 training smoke test."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np

import jax
import jax.numpy as jnp
import optax

from tvqvae_tpu.config import Config
from tvqvae_tpu.models import init_stage1
from tvqvae_tpu.models.fidelity_enhancer import FidelityEnhancer, Unet1D
from tvqvae_tpu.models.maskgit import FrozenStage1
from tvqvae_tpu.models.stage1 import Stage1Spec
from tvqvae_tpu.train.stage3 import (
    create_stage3_state,
    init_stage3,
    make_stage3_train_step,
    svq_roundtrip,
)


def test_unet1d_shapes():
    # odd length exercises the resize-skip path (reference interp skips)
    net = Unet1D(dim=8, channels=2, dim_mults=(1, 2), resnet_block_groups=4)
    x = jnp.zeros((2, 101, 2))
    y, _ = net.init_with_output(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, False
    )
    assert y.shape == (2, 101, 2)


def test_fidelity_enhancer_resizes_input():
    fe = FidelityEnhancer(input_length=96, in_channels=2, dim=8,
                          dim_mults=(1, 2), resnet_block_groups=4)
    x = jnp.zeros((2, 2, 50))  # wrong length on purpose
    y, _ = fe.init_with_output(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, False
    )
    assert y.shape == (2, 2, 96)


def test_fidelity_enhancer_bf16_matches_fp32():
    """bf16 U-Net stream: identical param tree (checkpoints interchangeable),
    fp32 output dtype, and loose agreement with the fp32 path (bf16 has ~3
    significant decimal digits)."""
    kw = dict(input_length=96, in_channels=2, dim=8, dim_mults=(1, 2),
              resnet_block_groups=4, dropout=0.0)
    fe32 = FidelityEnhancer(**kw)
    fe16 = FidelityEnhancer(**kw, compute_dtype="bfloat16")
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 2, 96)) * 0.3, jnp.float32
    )
    params = init_stage3(jax.random.key(0), fe32, x)
    assert jax.tree.structure(params) == jax.tree.structure(
        init_stage3(jax.random.key(0), fe16, x)
    )
    y32 = fe32.apply({"params": params}, x, False)
    y16 = fe16.apply({"params": params}, x, False)
    assert y16.dtype == jnp.float32
    assert bool(jnp.isfinite(y16).all())
    scale = float(jnp.abs(y32).max()) + 1e-6
    err = float(jnp.abs(y16 - y32).max()) / scale
    assert err < 0.1, err


def test_stage3_training_improves():
    cfg = Config.from_dict(
        {
            "encoder": {"init_dim": 4, "hid_dim": 16, "n_resnet_blocks": 1,
                        "downsampled_width": {"lf": 4, "hf": 8}},
            "decoder": {"n_resnet_blocks": 1},
            "VQ-VAE": {"n_fft": 4, "codebook_sizes": {"lf": 8, "hf": 8}},
        }
    )
    L, C, B = 96, 2, 8
    s1 = Stage1Spec.from_config(cfg, L, C)
    x = jax.random.normal(jax.random.key(0), (B, C, L)) * 0.3
    model, p1, bs1, vq_l, vq_h = init_stage1(jax.random.key(1), s1, x)
    frozen = FrozenStage1(params=p1, batch_stats=bs1, vq_l=vq_l, vq_h=vq_h)

    # SVQ roundtrip at tau=0 is deterministic
    a = svq_roundtrip(model, frozen, x, 0.0, None)
    b = svq_roundtrip(model, frozen, x, 0.0, None)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # at tau>0 it is stochastic
    c = svq_roundtrip(model, frozen, x, 5.0, jax.random.key(2))
    d = svq_roundtrip(model, frozen, x, 5.0, jax.random.key(3))
    assert not np.allclose(np.asarray(c), np.asarray(d))

    fe = FidelityEnhancer(input_length=L, in_channels=C, dim=8,
                          dim_mults=(1, 2), resnet_block_groups=4, dropout=0.1)
    params = init_stage3(jax.random.key(4), fe, x)
    tx = optax.adamw(1e-3)
    state = create_stage3_state(params, tx)
    step = jax.jit(make_stage3_train_step(model, fe, tx, tau=0.0),
                   donate_argnums=0)
    losses = []
    for _ in range(25):
        state, m = step(state, frozen, x, jax.random.key(5))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
