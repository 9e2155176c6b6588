"""Numpy-oracle golden test for the prior transformer (VERDICT r2 item 4
"prior-transformer parity evidence").

x-transformers is not installed here, so the prior has no weight-transplant
test against the reference's own module (PARITY.md D6). This test pins it
against an INDEPENDENT from-scratch numpy transcription of the exact
configuration the reference uses (bidirectional_transformer.py:92-110 —
ContinuousTransformerWrapper + pre-norm Encoder with RMSNorm, dim_head 64,
GELU FF, post-emb LayerNorm, project in/out) plus the reference's head
(:111-119,186-192 — Dense->GELU->LayerNorm(1e-12), weight-tied logits with
learned bias, mask-token logit dropped). Any silent drift in the flax
implementation breaks this to 1e-5."""

import numpy as np

import jax
import jax.numpy as jnp

from tvqvae_tpu.models.transformer import BidirectionalTransformer


# ---------------------------------------------------------------------------
# numpy oracle (no jax/flax code paths)


def np_gelu(x):
    # tanh approximation — flax nn.gelu default (approximate=True)
    return 0.5 * x * (1.0 + np.tanh(
        np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3)
    ))


def np_rmsnorm(x, scale, eps=1e-6):
    ms = np.mean(x ** 2, axis=-1, keepdims=True)
    return x / np.sqrt(ms + eps) * scale


def np_layernorm(x, scale, bias, eps=1e-6):
    mu = np.mean(x, axis=-1, keepdims=True)
    var = np.var(x, axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def np_encoder_block(x, p, heads, dim_head):
    """Pre-norm block: RMSNorm -> MHA (scale 1/sqrt(dim_head)) -> residual;
    RMSNorm -> Dense -> GELU -> Dense -> residual."""
    B, N, D = x.shape
    h = np_rmsnorm(x, p["RMSNorm_0"]["scale"])
    q = h @ p["Dense_0"]["kernel"]
    k = h @ p["Dense_1"]["kernel"]
    v = h @ p["Dense_2"]["kernel"]
    inner = q.shape[-1]
    q = q.reshape(B, N, heads, dim_head)
    k = k.reshape(B, N, heads, dim_head)
    v = v.reshape(B, N, heads, dim_head)
    attn = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(dim_head)
    attn = attn - attn.max(axis=-1, keepdims=True)
    attn = np.exp(attn)
    attn = attn / attn.sum(axis=-1, keepdims=True)
    h = np.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, N, inner)
    h = h @ p["Dense_3"]["kernel"] + p["Dense_3"]["bias"]
    x = x + h
    h = np_rmsnorm(x, p["RMSNorm_1"]["scale"])
    h = np_gelu(h @ p["Dense_4"]["kernel"] + p["Dense_4"]["bias"])
    h = h @ p["Dense_5"]["kernel"] + p["Dense_5"]["bias"]
    return x + h


def np_lf_transformer(params, s_l, class_idx, cfg):
    """Full LF prior forward in numpy, eval mode."""
    p = params
    emb = np.asarray(p["tok_emb_l"]["embedding"])[s_l]  # (B, N, E)
    B, N, E = emb.shape
    emb = emb + np.asarray(p["pos_emb"]["embedding"])[None, :N, :]
    if class_idx is None:
        idx = np.full((B, 1), cfg["n_classes"], np.int32)
    else:
        idx = np.asarray(class_idx, np.int32).reshape(B, 1)
    cls = np.asarray(p["class_emb"]["embedding"])[idx]  # (B, 1, E)
    h = np.concatenate([cls, emb], axis=1)

    if "project_in" in p:
        h = h @ p["project_in"]["kernel"] + p["project_in"]["bias"]
    h = np_layernorm(h, p["post_emb_norm"]["scale"], p["post_emb_norm"]["bias"])
    i = 0
    while f"block_{i}" in p:
        h = np_encoder_block(
            h, p[f"block_{i}"], cfg["heads"], cfg["dim_head"]
        )
        i += 1
    h = np_rmsnorm(h, p["RMSNorm_0"]["scale"])
    if "project_out" in p:
        h = h @ p["project_out"]["kernel"] + p["project_out"]["bias"]

    h = h[:, 1:, :]  # drop the class prefix token
    h = h @ p["pred_head"]["kernel"] + p["pred_head"]["bias"]
    h = np_gelu(h)
    h = np_layernorm(h, p["pred_norm"]["scale"], p["pred_norm"]["bias"],
                     eps=1e-12)
    logits = np.einsum(
        "bnd,kd->bnk", h, np.asarray(p["tok_emb_l"]["embedding"])
    ) + np.asarray(p["logit_bias"])
    return logits[:, :, :-1]  # drop mask-token logit


# ---------------------------------------------------------------------------


def _build(embed_dim, hidden_dim):
    t = BidirectionalTransformer(
        kind="lf", num_tokens=12, codebook_size_l=8, codebook_size_h=8,
        embed_dim=embed_dim, hidden_dim=hidden_dim, n_layers=2, heads=2,
        ff_mult=2, use_rmsnorm=True, p_unconditional=0.2, n_classes=3,
        model_dropout=0.3, emb_dropout=0.3,
    )
    rng = np.random.default_rng(0)
    s_l = jnp.asarray(rng.integers(0, 9, (4, 12)), jnp.int32)  # incl. mask tok
    y = jnp.asarray(rng.integers(0, 3, (4, 1)), jnp.int32)
    variables = t.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        s_l, None, y, False,
    )
    # randomize params (init leaves zeros/ones in norms; perturb everything
    # so the oracle exercises every term)
    leaves, treedef = jax.tree.flatten(variables["params"])
    leaves = [
        jnp.asarray(l) + jnp.asarray(
            np.random.default_rng(7 + i).normal(size=l.shape) * 0.05, l.dtype
        )
        for i, l in enumerate(leaves)
    ]
    params = jax.tree.unflatten(treedef, leaves)
    return t, params, s_l, y


def test_lf_prior_matches_numpy_oracle_projected():
    # embed_dim != hidden_dim exercises project_in/project_out
    t, params, s_l, y = _build(embed_dim=16, hidden_dim=24)
    got = np.asarray(t.apply({"params": params}, s_l, None, y, False))
    want = np_lf_transformer(
        jax.tree.map(np.asarray, params), np.asarray(s_l), np.asarray(y),
        {"n_classes": 3, "heads": 2, "dim_head": 64},
    )
    assert got.shape == want.shape == (4, 12, 8)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_lf_prior_matches_numpy_oracle_unconditional():
    # embed_dim == hidden_dim: no projections; unconditional class path
    t, params, s_l, _ = _build(embed_dim=16, hidden_dim=16)
    got = np.asarray(t.apply({"params": params}, s_l, None, None, False))
    want = np_lf_transformer(
        jax.tree.map(np.asarray, params), np.asarray(s_l), None,
        {"n_classes": 3, "heads": 2, "dim_head": 64},
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
