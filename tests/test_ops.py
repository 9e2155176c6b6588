"""Tests for interpolation, snake, shape math, schedule, scaler, config."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tvqvae_tpu.config import Config
from tvqvae_tpu.ops import (
    interp_linear,
    interp_nearest,
    snake,
    compute_downsample_rate,
    token_geometry,
)
from tvqvae_tpu.utils import MinMaxScaler, warmup_cosine_schedule


@pytest.mark.parametrize("L,size", [(10, 25), (25, 10), (7, 7), (301, 4633)])
def test_interp_linear_matches_torch(L, size):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, L)).astype(np.float32)
    ours = np.asarray(interp_linear(jnp.asarray(x), size))
    ref = F.interpolate(
        torch.from_numpy(x), size=size, mode="linear", align_corners=False
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4)  # fp32 index arithmetic


@pytest.mark.parametrize("L,size", [(10, 25), (25, 10), (8, 16)])
def test_interp_nearest_matches_torch(L, size):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, L)).astype(np.float32)
    ours = np.asarray(interp_nearest(jnp.asarray(x), size))
    ref = F.interpolate(torch.from_numpy(x), size=size, mode="nearest").numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_snake():
    x = np.linspace(-3, 3, 50, dtype=np.float32).reshape(1, 1, 50)
    a = np.float32(0.35)
    ours = np.asarray(snake(jnp.asarray(x), jnp.asarray(a)))
    ref = x + (1.0 / a) * np.sin(a * x) ** 2
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_downsample_rate_and_geometry_eham_limc():
    # Published EHAM->LIMC dataset: L=4633 (BASELINE.md).
    L, n_fft = 4633, 4
    assert compute_downsample_rate(L, n_fft, 8) == 579
    assert compute_downsample_rate(L, n_fft, 32) == 145
    g_l = token_geometry(L, n_fft, 8)
    g_h = token_geometry(L, n_fft, 32)
    assert (g_l.h_prime, g_l.w_prime, g_l.num_tokens) == (3, 9, 27)
    assert (g_h.h_prime, g_h.w_prime, g_h.num_tokens) == (3, 36, 108)
    assert g_l.w_frames == L + 1


def test_geometry_matches_simulated_conv_stack():
    # floor(W/2) per halving, as produced by stride-(1,2) kernel-(3,4) convs.
    for L in [63, 100, 301, 1000]:
        for width in [4, 8, 32]:
            g = token_geometry(L, 4, width)
            w = L + 1
            for _ in range(g.num_halvings):
                w = (w + 2 - 4) // 2 + 1  # torch conv out-size formula
            assert w == g.w_prime, (L, width)


def test_warmup_cosine_schedule():
    sched = warmup_cosine_schedule(1e-3, 1000, 0.1, 1e-6)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(100)) - 1e-3) < 1e-9  # end of warmup
    assert abs(float(sched(50)) - 0.5e-3) < 1e-9  # mid warmup
    assert abs(float(sched(1000)) - 1e-6) < 1e-9  # annealed to min
    assert float(sched(550)) < 1e-3  # decaying


def test_minmax_scaler_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(50, 8)) * 10 + 3
    s = MinMaxScaler()
    z = s.fit_transform(x)
    assert z.min() >= -1.0 - 1e-9 and z.max() <= 1.0 + 1e-9
    np.testing.assert_allclose(s.inverse_transform(z), x, atol=1e-9)
    s2 = MinMaxScaler.from_state(s.to_state())
    np.testing.assert_allclose(s2.transform(x), z)


def test_config_parses_reference_yaml_schema():
    d = {
        "dataset": {"features": ["latitude"], "batch_sizes": {"stage1": 8}},
        "exp_params": {"lr": 0.002, "linear_warmup_rate": 0.2},
        "trainer_params": {"max_steps": {"stage1": 10}},
        "encoder": {"init_dim": 4, "hid_dim": 64,
                    "downsampled_width": {"lf": 8, "hf": 32}},
        "decoder": {"n_resnet_blocks": 1},
        "VQ-VAE": {"n_fft": 4, "codebook_sizes": {"lf": 16, "hf": 16}},
        "MaskGIT": {
            "choice_temperatures": {"lf": 10, "hf": 4},
            "T": {"lf": 10, "hf": 1},
            "cfg_scale": 1.0,
            "prior_model_l": {"hidden_dim": 64, "n_layers": 2, "heads": 2,
                              "ff_mult": 1, "use_rmsnorm": True,
                              "p_unconditional": 0.2, "model_dropout": 0.3,
                              "emb_dropout": 0.3},
            "prior_model_h": {"hidden_dim": 32, "n_layers": 1, "heads": 1,
                              "ff_mult": 1, "use_rmsnorm": True,
                              "p_unconditional": 0.2, "model_dropout": 0.3,
                              "emb_dropout": 0.3},
        },
        "fidelity_enhancer": {"dim": 8, "dim_mults": [1, 2], "dropout": 0.5,
                              "resnet_block_groups": 4,
                              "tau_search_rng": [0.1, 0.5],
                              "percept_loss_weight": 0.0},
        "evaluation": {"batch_size": 16, "min_num_gen_samples": 64,
                       "feature_extractor_type": "rocket"},
        "logger": {"mlflow_uri": None, "experiment_name": "t"},
    }
    cfg = Config.from_dict(d)
    assert cfg.exp_params.lr == 0.002
    assert cfg.vqvae.codebook_sizes["lf"] == 16
    assert cfg.maskgit.prior_model_l.hidden_dim == 64
    assert cfg.maskgit.prior_model_h.n_layers == 1
    assert cfg.encoder.hid_dim == 64
    assert cfg.fidelity_enhancer.dim_mults == [1, 2]
    assert cfg.evaluation.batch_size == 16
