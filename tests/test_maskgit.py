"""Tests for the transformer prior, masking semantics, and the lax.scan
iterative decoder."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tvqvae_tpu.config import Config
from tvqvae_tpu.models.maskgit import (
    MaskGITSpec,
    build_transformers,
    decode_band_scan,
    decode_schedule,
    gamma_fn,
    iterative_decoding,
    masked_ce,
    random_mask_tokens,
)
from tvqvae_tpu.models.stage1 import Stage1Spec
from tvqvae_tpu.models.transformer import BidirectionalTransformer
from tvqvae_tpu.train.stage2 import (
    create_stage2_state,
    init_stage2,
    make_prior_apply_fns,
    make_stage2_train_step,
)


def tiny_cfg():
    return Config.from_dict(
        {
            "encoder": {
                "init_dim": 4, "hid_dim": 16, "n_resnet_blocks": 1,
                "downsampled_width": {"lf": 4, "hf": 8},
            },
            "decoder": {"n_resnet_blocks": 1},
            "VQ-VAE": {"n_fft": 4, "codebook_sizes": {"lf": 8, "hf": 8}},
            "MaskGIT": {
                "choice_temperatures": {"lf": 10, "hf": 4},
                "T": {"lf": 4, "hf": 1},
                "cfg_scale": 1.0,
                "prior_model_l": {"hidden_dim": 16, "n_layers": 2, "heads": 2,
                                  "ff_mult": 1, "use_rmsnorm": True,
                                  "p_unconditional": 0.2,
                                  "model_dropout": 0.1, "emb_dropout": 0.1},
                "prior_model_h": {"hidden_dim": 16, "n_layers": 1, "heads": 1,
                                  "ff_mult": 1, "use_rmsnorm": True,
                                  "p_unconditional": 0.2,
                                  "model_dropout": 0.1, "emb_dropout": 0.1},
            },
        }
    )


@pytest.fixture
def setup():
    cfg = tiny_cfg()
    s1 = Stage1Spec.from_config(cfg, 96, 2)
    spec = MaskGITSpec.from_config(cfg, s1)
    t_l, t_h = build_transformers(cfg, s1, n_classes=3)
    params, h_stats = init_stage2(jax.random.key(0), t_l, t_h, spec)
    return cfg, s1, spec, t_l, t_h, params, h_stats


def test_gamma_schedules():
    for mode, at_half in [("linear", 0.5), ("cosine", np.cos(np.pi / 4)),
                          ("square", 0.75), ("cubic", 0.875)]:
        g = gamma_fn(mode)
        assert np.isclose(g(np.array(0.0)), 1.0)
        assert np.isclose(g(np.array(1.0)), 0.0)
        assert np.isclose(g(np.array(0.5)), at_half)


def test_decode_schedule_static():
    mask_lens, temps = decode_schedule(27, 10, 10.0, "cosine")
    assert mask_lens.shape == (10,) and temps.shape == (10,)
    assert int(mask_lens[-1]) == 0  # final step unmasks everything
    assert float(temps[-1]) == 0.0
    assert (np.diff(np.asarray(mask_lens)) <= 0).all()  # monotone


def test_random_mask_exact_counts():
    rng = jax.random.key(0)
    s = jnp.ones((64, 27), jnp.int32) * 3
    s_M, keep = random_mask_tokens(rng, s, mask_token=8)
    # at least one masked per row (reference clip to n-1)
    assert (np.asarray(keep).sum(axis=1) <= 26).all()
    # masked positions hold the mask token, kept hold originals
    sm = np.asarray(s_M)
    k = np.asarray(keep)
    assert (sm[k] == 3).all() and (sm[~k] == 8).all()


def test_masked_ce_only_counts_masked():
    logits = jnp.zeros((2, 4, 8))
    targets = jnp.zeros((2, 4), jnp.int32)
    keep = jnp.asarray([[True, True, True, False], [True, True, False, False]])
    # uniform logits -> CE = log(8) on each masked position
    ce = float(masked_ce(logits, targets, keep))
    assert np.isclose(ce, np.log(8), atol=1e-5)


def test_transformer_shapes_lf_hf(setup):
    _, s1, spec, t_l, t_h, params, h_stats = setup
    B = 4
    s_l = jnp.zeros((B, spec.tokens_l), jnp.int32)
    s_h = jnp.zeros((B, spec.tokens_h), jnp.int32)
    y = jnp.ones((B, 1), jnp.int32)
    out_l = t_l.apply({"params": params["l"]}, s_l, None, y, False)
    assert out_l.shape == (B, spec.tokens_l, 8)  # mask logit dropped
    out_h = t_h.apply(
        {"params": params["h"], "batch_stats": h_stats}, s_l, s_h, y, False
    )
    assert out_h.shape == (B, spec.tokens_h, 8)
    # unconditional pass works
    out_u = t_l.apply({"params": params["l"]}, s_l, None, None, False)
    assert out_u.shape == out_l.shape
    assert not np.allclose(np.asarray(out_u), np.asarray(out_l))


def test_iterative_decoding_fills_all_tokens(setup):
    _, s1, spec, t_l, t_h, params, h_stats = setup
    apply_l, apply_h = make_prior_apply_fns(t_l, t_h, params, h_stats)
    s_l, s_h = jax.jit(
        lambda r: iterative_decoding(r, spec, apply_l, apply_h, 6, None)
    )(jax.random.key(1))
    assert s_l.shape == (6, spec.tokens_l)
    assert s_h.shape == (6, spec.tokens_h)
    assert (np.asarray(s_l) != spec.mask_token_l).all()
    assert (np.asarray(s_h) != spec.mask_token_h).all()
    assert (np.asarray(s_l) >= 0).all() and (np.asarray(s_l) < 8).all()

    # conditional decoding also fills and differs across classes
    s_l0, _ = jax.jit(
        lambda r: iterative_decoding(r, spec, apply_l, apply_h, 6, 0)
    )(jax.random.key(1))
    assert (np.asarray(s_l0) != spec.mask_token_l).all()


def test_cfg_scale_mixing(setup):
    cfg, s1, spec, t_l, t_h, params, h_stats = setup
    from dataclasses import replace

    apply_l, apply_h = make_prior_apply_fns(t_l, t_h, params, h_stats)
    spec2 = replace(spec, cfg_scale=2.0)
    s_l, s_h = iterative_decoding(
        jax.random.key(3), spec2, apply_l, apply_h, 2, 1
    )
    assert (np.asarray(s_l) != spec.mask_token_l).all()


def test_stage2_step_learns_toy_distribution(setup):
    """Train directly on synthetic token targets by stubbing stage-1 encode:
    instead, drive the real path end-to-end with a tiny stage-1."""
    cfg, s1, spec, t_l, t_h, params, h_stats = setup
    import jax.numpy as jnp
    from tvqvae_tpu.models import init_stage1
    from tvqvae_tpu.models.maskgit import FrozenStage1

    x = jax.random.normal(jax.random.key(0), (8, 2, 96))
    y = jnp.zeros((8, 1), jnp.int32)
    model, p1, bs1, vq_l, vq_h = init_stage1(jax.random.key(1), s1, x)
    frozen = FrozenStage1(params=p1, batch_stats=bs1, vq_l=vq_l, vq_h=vq_h)

    tx = optax.adamw(1e-3)
    state = create_stage2_state(params, h_stats, tx)
    step = jax.jit(make_stage2_train_step(model, t_l, t_h, spec, tx),
                   donate_argnums=0)
    losses = []
    for i in range(30):
        state, m = step(state, frozen, x, y, jax.random.key(2))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_ess_confidence_and_decoding(setup):
    """ESS components (reference maskgit.py:479-679, disabled there):
    batched token critic + critical reverse sampling + critic decode."""
    import jax.numpy as jnp
    from tvqvae_tpu.models.maskgit import (
        compute_confidence_score,
        critical_reverse_sampling,
        iterative_decoding_ess,
    )

    cfg, s1, spec, t_l, t_h, params, h_stats = setup
    apply_l, apply_h = make_prior_apply_fns(t_l, t_h, params, h_stats)
    embed_l = jax.random.normal(jax.random.key(0), (9, s1.hid_dim))
    embed_h = jax.random.normal(jax.random.key(1), (9, s1.hid_dim))

    s = jax.random.randint(jax.random.key(2), (4, spec.tokens_l), 0, 8)
    conf = compute_confidence_score(apply_l, s, spec.mask_token_l, embed_l)
    assert conf.shape == (4, spec.tokens_l)
    np.testing.assert_allclose(np.asarray(conf).sum(-1), 1.0, rtol=1e-5)

    t_star, s_star = critical_reverse_sampling(
        apply_l, s, conf, spec.mask_token_l, spec.T_l, spec.tokens_l, embed_l
    )
    assert 1 <= t_star < spec.T_l
    assert (np.asarray(s_star) == spec.mask_token_l).any()

    s_l, s_h = iterative_decoding_ess(
        jax.random.key(3), spec, apply_l, apply_h, embed_l, embed_h, 4, None
    )
    assert (np.asarray(s_l) != spec.mask_token_l).all()
    assert (np.asarray(s_h) != spec.mask_token_h).all()


def test_ess_config_parsing():
    from tvqvae_tpu.config import Config

    cfg = Config.from_dict(
        {"MaskGIT": {"ESS": {"use": True, "error_ratio_ma_rate": 0.5}}}
    )
    assert cfg.maskgit.ess_use is True
    assert cfg.maskgit.ess_error_ratio_ma_rate == 0.5
    assert Config().maskgit.ess_use is False


def test_sampling_fans_out_over_mesh(setup):
    """Generation fan-out: outputs sharded over the data mesh axis."""
    import jax.numpy as jnp
    from tvqvae_tpu.models import init_stage1
    from tvqvae_tpu.models.maskgit import FrozenStage1
    from tvqvae_tpu.parallel import make_mesh, replicate_tree
    from tvqvae_tpu.train.stage2 import make_sampling_fn

    cfg, s1, spec, t_l, t_h, params, h_stats = setup
    x = jax.random.normal(jax.random.key(0), (8, 2, 96))
    from tvqvae_tpu.models.stage1 import Stage1Model

    model, p1, bs1, vq_l, vq_h = init_stage1(jax.random.key(1), s1, x)
    mesh = make_mesh()
    frozen = replicate_tree(
        mesh, FrozenStage1(params=p1, batch_stats=bs1, vq_l=vq_l, vq_h=vq_h)
    )
    params_r = replicate_tree(mesh, params)
    stats_r = replicate_tree(mesh, h_stats)
    fn = make_sampling_fn(model, t_l, t_h, spec, mesh=mesh)
    x_l, x_h, xg = fn(frozen, params_r, stats_r, jax.random.key(2), 16, None)
    assert xg.shape == (16, 2, 96)
    assert np.isfinite(np.asarray(xg)).all()
    # output actually sharded over the 8-device data axis
    assert len(xg.sharding.device_set) == mesh.devices.size
