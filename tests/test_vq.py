"""Vector-quantizer semantics tests.

Checks the functional codebook against the reference semantics
(timevqvae/models/vq.py:210-243): nearest-code assignment, EMA update with
Laplace smoothing, pre-update embedding for the quantized output,
straight-through gradients, commitment loss, perplexity, temperature
sampling, k-means init, and the Pallas kernel (interpret mode on CPU).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tvqvae_tpu.models.vq import (
    CodebookState,
    VQParams,
    init_codebook,
    lookup_codes,
    vq_forward,
)
from tvqvae_tpu.ops.vq_pallas import nearest_codes_stats_pallas


def _ref_numpy_step(embed, embed_avg, cluster_size, x_flat, decay, eps):
    """Reference EMA math (vq.py:210-242) independently in numpy."""
    d = (
        (x_flat ** 2).sum(1, keepdims=True)
        - 2 * x_flat @ embed.T
        + (embed ** 2).sum(1)[None, :]
    )
    idx = np.argmin(d, axis=1)
    onehot = np.eye(embed.shape[0])[idx]
    counts = onehot.sum(0)
    new_cs = cluster_size * decay + counts * (1 - decay)
    embed_sum = x_flat.T @ onehot  # (D, K)
    new_avg = embed_avg * decay + embed_sum.T * (1 - decay)
    n = new_cs.sum()
    smoothed = (new_cs + eps) / (n + embed.shape[0] * eps) * n
    new_embed = new_avg / smoothed[:, None]
    quantized = embed[idx]  # pre-update embedding
    return idx, quantized, new_embed, new_avg, new_cs


@pytest.fixture
def setup():
    p = VQParams(codebook_size=16, dim=8)
    state = init_codebook(jax.random.key(0), p)
    x = jax.random.normal(jax.random.key(1), (4, 6, 8))
    return p, state, x


def test_assignment_and_ema_match_reference_math(setup):
    p, state, x = setup
    out = vq_forward(state, x, p, train=True)

    idx_ref, q_ref, emb_ref, avg_ref, cs_ref = _ref_numpy_step(
        np.asarray(state.embed, np.float64),
        np.asarray(state.embed_avg, np.float64),
        np.asarray(state.cluster_size, np.float64),
        np.asarray(x, np.float64).reshape(-1, 8),
        p.decay,
        p.eps,
    )
    np.testing.assert_array_equal(np.asarray(out.indices).ravel(), idx_ref)
    np.testing.assert_allclose(
        np.asarray(out.quantized).reshape(-1, 8), q_ref, atol=1e-5
    )  # straight-through value == pre-update codes
    np.testing.assert_allclose(np.asarray(out.state.embed), emb_ref, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.state.embed_avg), avg_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.state.cluster_size), cs_ref, atol=1e-5)


def test_eval_mode_leaves_state(setup):
    p, state, x = setup
    out = vq_forward(state, x, p, train=False)
    np.testing.assert_array_equal(np.asarray(out.state.embed), np.asarray(state.embed))
    # eval quantized equals plain lookup (no straight-through mixing)
    np.testing.assert_allclose(
        np.asarray(out.quantized),
        np.asarray(lookup_codes(state, out.indices)),
        atol=1e-6,
    )


def test_straight_through_gradient(setup):
    p, state, x = setup

    def f(x):
        return jnp.sum(vq_forward(state, x, p, train=True).quantized)

    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), np.ones_like(x), atol=1e-6)


def test_commit_loss_and_perplexity(setup):
    p, state, x = setup
    out = vq_forward(state, x, p, train=True)
    q = np.asarray(lookup_codes(state, out.indices))
    ref_commit = np.mean((q - np.asarray(x)) ** 2)
    np.testing.assert_allclose(float(out.commit_loss), ref_commit, rtol=1e-5)
    assert 1.0 <= float(out.perplexity) <= p.codebook_size


def test_svq_temperature_sampling(setup):
    p, state, x = setup
    out_argmax = vq_forward(state, x, p, train=False)
    out_hot = vq_forward(
        state, x, p, train=False, svq_temp=50.0, rng=jax.random.key(7)
    )
    # very high temperature: assignments differ from argmax with high prob
    assert (
        np.asarray(out_hot.indices) != np.asarray(out_argmax.indices)
    ).mean() > 0.3
    # temp=0 equals argmax
    out_zero = vq_forward(state, x, p, train=False, svq_temp=0.0)
    np.testing.assert_array_equal(
        np.asarray(out_zero.indices), np.asarray(out_argmax.indices)
    )


def test_kmeans_init_latch():
    p = VQParams(codebook_size=8, dim=4, kmeans_init=True, kmeans_iters=5)
    state = init_codebook(jax.random.key(0), p)
    assert not bool(state.initted)
    x = jax.random.normal(jax.random.key(1), (16, 4, 4))
    out = vq_forward(state, x, p, train=True, rng=jax.random.key(2))
    assert bool(out.state.initted)
    assert float(jnp.abs(out.state.embed).sum()) > 0.0
    # second step must not re-init: feed different data, embed moves by EMA only
    out2 = vq_forward(out.state, x * 100.0, p, train=True, rng=jax.random.key(3))
    assert bool(out2.state.initted)


def test_dead_code_expiry():
    p = VQParams(codebook_size=8, dim=4, threshold_ema_dead_code=2)
    state = init_codebook(jax.random.key(0), p)
    x = jax.random.normal(jax.random.key(1), (4, 4, 4))
    out = vq_forward(state, x, p, train=True, rng=jax.random.key(2))
    # all codes start with cluster_size 0 -> below threshold -> all replaced
    # with batch rows
    flat = np.asarray(x).reshape(-1, 4)
    emb = np.asarray(out.state.embed)
    for row in emb:
        assert np.isclose(flat, row[None, :], atol=1e-5).all(axis=1).any()


def test_pallas_kernel_matches_xla():
    rng = np.random.default_rng(0)
    for M, D, K in [(96, 8, 16), (512, 128, 32), (700, 64, 32)]:
        flat = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32))
        embed = jnp.asarray(rng.normal(size=(K, D)).astype(np.float32))
        idx, counts, embed_sum = nearest_codes_stats_pallas(flat, embed)

        d = (
            (np.asarray(flat) ** 2).sum(1, keepdims=True)
            - 2 * np.asarray(flat) @ np.asarray(embed).T
            + (np.asarray(embed) ** 2).sum(1)[None, :]
        )
        idx_ref = np.argmin(d, axis=1)
        np.testing.assert_array_equal(np.asarray(idx), idx_ref)
        onehot = np.eye(K)[idx_ref]
        np.testing.assert_allclose(np.asarray(counts), onehot.sum(0), atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(embed_sum), onehot.T @ np.asarray(flat), atol=1e-3
        )


def test_vq_forward_pallas_path_matches_xla_path(setup):
    p, state, x = setup
    p_pallas = VQParams(**{**p.__dict__, "use_pallas": True})
    out_x = vq_forward(state, x, p, train=True)
    out_p = vq_forward(state, x, p_pallas, train=True)
    np.testing.assert_array_equal(np.asarray(out_x.indices), np.asarray(out_p.indices))
    np.testing.assert_allclose(
        np.asarray(out_x.state.embed), np.asarray(out_p.state.embed), atol=1e-4
    )
    np.testing.assert_allclose(
        float(out_x.perplexity), float(out_p.perplexity), rtol=1e-4
    )


def test_vq_pallas_under_grad(setup):
    """jax.grad THROUGH the pallas path (the in-situ training-step case the
    round-5 bench exposed: without stop_gradient on the kernel inputs, JAX
    attempts a JVP of the kernel and trips pallas' program_id assertion).
    The encoder gradient must equal the XLA path's bitwise-semantics
    (straight-through + commit loss only)."""
    import jax
    import jax.numpy as jnp

    p, state, x = setup
    p_pallas = VQParams(**{**p.__dict__, "use_pallas": True})

    def loss(xin, params):
        out = vq_forward(state, xin, params, train=True)
        # straight-through consumer + commit term, like stage-1's loss
        return jnp.sum(out.quantized ** 2) + out.commit_loss

    g_x = jax.grad(lambda xi: loss(xi, p))(x)
    g_p = jax.grad(lambda xi: loss(xi, p_pallas))(x)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=1e-4, atol=1e-5)
