"""Equivalence of the precomputed frozen-stage paths with the on-the-fly
steps (VERDICT r2 item 2).

Stage-2: the frozen stage-1 encode (eval BN + argmax VQ) is deterministic,
so one precompute sweep + the token-consuming step must produce IDENTICAL
losses/updates to the step that encodes inside (reference maskgit.py:167-168
recomputes every step). Stage-3 likewise for the tau=0 SVQ roundtrip
(reference stage3.py:205-210)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tvqvae_tpu.config import Config
from tvqvae_tpu.models import init_stage1
from tvqvae_tpu.models.fidelity_enhancer import FidelityEnhancer
from tvqvae_tpu.models.maskgit import FrozenStage1, MaskGITSpec, build_transformers
from tvqvae_tpu.models.stage1 import Stage1Spec

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


@pytest.fixture(scope="module")
def stage1_bundle():
    cfg = tiny_cfg()
    L, C, B = 96, 2, 8
    s1 = Stage1Spec.from_config(cfg, L, C)
    x = jax.random.normal(jax.random.key(0), (B, C, L)) * 0.3
    model, p1, bs1, vq_l, vq_h = init_stage1(jax.random.key(1), s1, x)
    frozen = FrozenStage1(params=p1, batch_stats=bs1, vq_l=vq_l, vq_h=vq_h)
    return cfg, s1, model, frozen, np.asarray(x)


def test_stage2_token_step_matches_onthefly(stage1_bundle):
    from tvqvae_tpu.train.stage2 import (
        create_stage2_state,
        init_stage2,
        make_stage2_train_step,
        make_stage2_train_step_tokens,
        precompute_token_dataset,
    )

    cfg, s1, model, frozen, x = stage1_bundle
    spec = MaskGITSpec.from_config(cfg, s1)
    t_l, t_h = build_transformers(cfg, s1, n_classes=3)
    params, h_stats = init_stage2(jax.random.key(2), t_l, t_h, spec)
    tx = optax.adamw(1e-3)
    state_a = create_stage2_state(params, h_stats, tx)
    state_b = create_stage2_state(params, h_stats, tx)

    tok_l, tok_h = precompute_token_dataset(model, frozen, x, batch_size=5)
    assert tok_l.shape == (len(x), spec.tokens_l)
    assert tok_h.shape == (len(x), spec.tokens_h)
    # a second sweep with a different batch shape is identical (deterministic)
    tok_l2, tok_h2 = precompute_token_dataset(model, frozen, x, batch_size=8)
    np.testing.assert_array_equal(tok_l, tok_l2)
    np.testing.assert_array_equal(tok_h, tok_h2)

    step_fly = jax.jit(make_stage2_train_step(model, t_l, t_h, spec, tx))
    step_tok = jax.jit(make_stage2_train_step_tokens(t_l, t_h, spec, tx))

    y = jnp.asarray(np.random.default_rng(0).integers(0, 3, (len(x), 1)))
    rng = jax.random.key(7)
    for _ in range(3):  # a few steps so divergence would compound
        state_a, m_a = step_fly(state_a, frozen, jnp.asarray(x), y, rng)
        state_b, m_b = step_tok(
            state_b, jnp.asarray(tok_l), jnp.asarray(tok_h), y, rng
        )
        for k in m_a:
            assert np.isclose(float(m_a[k]), float(m_b[k]), rtol=1e-5), k
    for la, lb in zip(jax.tree.leaves(state_a.params),
                      jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-5, atol=1e-6)


def test_stage3_pre_step_matches_onthefly(stage1_bundle):
    from tvqvae_tpu.train.stage3 import (
        create_stage3_state,
        init_stage3,
        make_stage3_train_step,
        make_stage3_train_step_pre,
        precompute_xprime_dataset,
        svq_roundtrip,
    )

    cfg, s1, model, frozen, x = stage1_bundle
    L, C = x.shape[2], x.shape[1]
    fe = FidelityEnhancer(input_length=L, in_channels=C, dim=8,
                          dim_mults=(1, 2), resnet_block_groups=4)
    params = init_stage3(jax.random.key(3), fe, jnp.asarray(x[:2]))
    tx = optax.adamw(1e-3)
    state_a = create_stage3_state(params, tx, 0.0)
    state_b = create_stage3_state(params, tx, 0.0)

    xp = precompute_xprime_dataset(model, frozen, x, batch_size=5)
    ref = np.asarray(svq_roundtrip(model, frozen, jnp.asarray(x), 0.0, None))
    np.testing.assert_allclose(xp, ref, rtol=1e-5, atol=1e-6)

    step_fly = jax.jit(make_stage3_train_step(model, fe, tx, tau=0.0))
    step_pre = jax.jit(make_stage3_train_step_pre(fe, tx))

    rng = jax.random.key(9)
    for _ in range(2):
        state_a, m_a = step_fly(state_a, frozen, jnp.asarray(x), rng)
        state_b, m_b = step_pre(state_b, jnp.asarray(x), jnp.asarray(xp), rng)
        for k in m_a:
            assert np.isclose(float(m_a[k]), float(m_b[k]), rtol=1e-5), k
    for la, lb in zip(jax.tree.leaves(state_a.params),
                      jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-5, atol=1e-6)
