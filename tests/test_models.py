"""Shape/behavior tests for the VQ-VAE conv stacks, stage-1 model, and FCN."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tvqvae_tpu.config import Config
from tvqvae_tpu.models import (
    FCN,
    Stage1Spec,
    init_stage1,
    stage1_losses,
)
from tvqvae_tpu.models.layers import ConvTranspose2dTorch
from tvqvae_tpu.models.vqvae import VQVAEDecoder, VQVAEEncoder
from tvqvae_tpu.ops import token_geometry


def tiny_config(**enc):
    return Config.from_dict(
        {
            "encoder": {
                "init_dim": 4,
                "hid_dim": 16,
                "n_resnet_blocks": 1,
                "downsampled_width": {"lf": 4, "hf": 8},
                **enc,
            },
            "decoder": {"n_resnet_blocks": 1},
            "VQ-VAE": {"n_fft": 4, "codebook_sizes": {"lf": 8, "hf": 8}},
        }
    )


def test_conv_transpose_torch_geometry():
    # torch: out = (in-1)*stride - 2*pad + kernel
    m = ConvTranspose2dTorch(3, (3, 4), (1, 2), (1, 1))
    x = jnp.zeros((2, 3, 10, 5))
    y, _ = m.init_with_output(jax.random.key(0), x)
    assert y.shape == (2, 3, 20, 3)  # H stays, W doubles


@pytest.mark.parametrize("L", [128, 200])
@pytest.mark.slow  # big compile (round-5 fast-tier budget)
def test_encoder_decoder_geometry(L):
    g = token_geometry(L, 4, 4)
    enc = VQVAEEncoder(4, 16, g.num_halvings, 1)
    x = jnp.zeros((2, g.w_frames, 3, 8)).transpose(0, 2, 1, 3)  # (B,H,W,2C)
    x = jnp.zeros((2, 3, g.w_frames, 8))
    (z, _) = enc.init_with_output(
        {"params": jax.random.key(0)}, x, False
    )
    assert z.shape == (2, g.h_prime, g.w_prime, 16)

    dec = VQVAEDecoder(4, 16, 8, g.num_halvings, 1)
    (u, _) = dec.init_with_output({"params": jax.random.key(1)}, z, False)
    # decoder upsamples num_halvings+1 times (reference vq_vae.py:238-251)
    assert u.shape == (2, 3, g.w_prime * 2 ** (g.num_halvings + 1), 8)


@pytest.mark.slow  # big compile (round-5 fast-tier budget)
def test_stage1_forward_shapes_and_losses():
    cfg = tiny_config()
    L, C, B = 128, 2, 4
    spec = Stage1Spec.from_config(cfg, L, C)
    x = jax.random.normal(jax.random.key(0), (B, C, L))
    model, params, batch_stats, vq_l, vq_h = init_stage1(
        jax.random.key(1), spec, x
    )

    out, mut = model.apply(
        {"params": params, "batch_stats": batch_stats},
        x, vq_l, vq_h, True,
        rngs={"dropout": jax.random.key(2)},
        mutable=["batch_stats"],
    )
    for arr in (out.x_l, out.x_h, out.xhat_l, out.xhat_h):
        assert arr.shape == (B, C, L)
    assert out.vq_l.indices.shape == (B, spec.tokens_l)
    assert out.vq_h.indices.shape == (B, spec.tokens_h)

    total, metrics = stage1_losses(out)
    assert np.isfinite(float(total))
    assert set(metrics) >= {
        "loss", "recons_loss.LF.time", "recons_loss.HF.time",
        "commit_loss.LF", "commit_loss.HF", "perplexity.LF", "perplexity.HF",
    }
    # batch stats actually updated in train mode
    assert mut["batch_stats"]

    # VQ states advanced
    assert not np.allclose(
        np.asarray(out.vq_l.state.embed), np.asarray(vq_l.embed)
    )

    # eval mode: state unchanged, no mutation needed
    out_eval = model.apply(
        {"params": params, "batch_stats": batch_stats},
        x, vq_l, vq_h, False,
    )
    np.testing.assert_array_equal(
        np.asarray(out_eval.vq_l.state.embed), np.asarray(vq_l.embed)
    )


@pytest.mark.slow  # big compile (round-5 fast-tier budget)
def test_stage1_encode_decode_roundtrip_shapes():
    cfg = tiny_config()
    L, C, B = 100, 1, 2
    spec = Stage1Spec.from_config(cfg, L, C)
    x = jax.random.normal(jax.random.key(0), (B, C, L))
    model, params, batch_stats, vq_l, vq_h = init_stage1(
        jax.random.key(1), spec, x
    )
    z = model.apply(
        {"params": params, "batch_stats": batch_stats},
        x, "lf", method="encode",
    )
    assert z.shape == (B, spec.tokens_l, spec.hid_dim)
    xt = model.apply(
        {"params": params, "batch_stats": batch_stats},
        z, "lf", method="decode",
    )
    assert xt.shape == (B, C, L)


def test_fcn_shapes():
    fcn = FCN(n_classes=5)
    x = jnp.zeros((3, 4, 64))
    vars_ = fcn.init({"params": jax.random.key(0)}, x, False)
    logits = fcn.apply(vars_, x, False)
    assert logits.shape == (3, 5)
    feats = fcn.apply(vars_, x, False, features=True)
    assert feats.shape == (3, 128)


@pytest.mark.slow  # big compile (round-5 fast-tier budget)
def test_stage1_bf16_compute_close_to_fp32():
    """bfloat16 conv-stack compute (params fp32) stays finite and close to
    the fp32 forward; params are dtype-agnostic so the same tree serves both."""
    from tvqvae_tpu.models import Stage1Spec, init_stage1
    from tvqvae_tpu.models.stage1 import Stage1Model

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
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 2, 96)), jnp.float32
    )
    spec32 = Stage1Spec.from_config(cfg, 96, 2)
    model32, params, batch_stats, vq_l, vq_h = init_stage1(
        jax.random.key(0), spec32, x
    )
    spec16 = Stage1Spec.from_config(cfg, 96, 2, compute_dtype="bfloat16")
    model16 = Stage1Model(spec16)

    out32 = model32.apply(
        {"params": params, "batch_stats": batch_stats}, x, vq_l, vq_h, False
    )
    out16 = model16.apply(
        {"params": params, "batch_stats": batch_stats}, x, vq_l, vq_h, False
    )
    assert out16.xhat_l.dtype == jnp.float32  # cast back before losses
    assert bool(jnp.isfinite(out16.xhat_l).all())
    assert bool(jnp.isfinite(out16.xhat_h).all())
    # bf16 has ~3 decimal digits; outputs should agree loosely
    scale = float(jnp.abs(out32.xhat_l).max()) + 1e-6
    err = float(jnp.abs(out16.xhat_l - out32.xhat_l).max()) / scale
    assert err < 0.1, err
    # token assignments should mostly agree (VQ runs fp32 on both paths)
    agree = float((out16.vq_l.indices == out32.vq_l.indices).mean())
    assert agree > 0.9, agree
