"""Bidirectional (non-causal) transformer priors over VQ token grids.

Re-implementation of the reference's prior models
(timevqvae/models/bidirectional_transformer.py:33-251), which wrap the
external x-transformers library (ContinuousTransformerWrapper + Encoder,
:92-110). Matching surface, built from scratch in flax:

  - token embeddings with a +1 mask token (:79-85), learned positional
    embeddings added to tokens only (:88,180-182), a class-condition
    embedding with a +1 unconditional class prepended as a prefix token
    (:89-91,182),
  - pre-norm encoder blocks (RMSNorm option), head dim 64, configurable
    heads / ff_mult / attention / FF / whole-layer dropout (:98-110),
  - input projection when the model width differs from the embedding width,
    post-embedding LayerNorm, output projection back (x-transformers
    wrapper behavior),
  - prediction head Dense->GELU->LayerNorm(eps 1e-12) with weight-tied
    output logits `h @ tok_emb^T + bias`, mask-token logit dropped
    (:111-119,186-192),
  - classifier-free-guidance class dropout during training
    (p_unconditional, :140-150) and mask-token-exempt embedding dropout
    (:152-164),
  - HF variant: LF embeddings stretched to the HF grid by `Upscale`
    (nearest resize + two k3 convs with BatchNorm, :12-30) and concatenated
    (in_dim = 2*embed_dim, :73,194-236).

All shapes static; the token grids are tiny (27 / 108 tokens) so the whole
prior is a handful of MXU matmuls per step.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tvqvae_tpu.ops.interp import interp_nearest
from .layers import batch_norm


class EncoderBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int = 64
    ff_mult: int = 1
    use_rmsnorm: bool = True
    dropout: float = 0.0  # attn + ff dropout
    layer_dropout: float = 0.0

    def _norm(self):
        return nn.RMSNorm() if self.use_rmsnorm else nn.LayerNorm()

    @nn.compact
    def __call__(self, x, train: bool = False):
        inner = self.heads * self.dim_head

        # --- attention branch ---
        h = self._norm()(x)
        q = nn.Dense(inner, use_bias=False)(h)
        k = nn.Dense(inner, use_bias=False)(h)
        v = nn.Dense(inner, use_bias=False)(h)
        B, N, _ = x.shape
        q = q.reshape(B, N, self.heads, self.dim_head)
        k = k.reshape(B, N, self.heads, self.dim_head)
        v = v.reshape(B, N, self.heads, self.dim_head)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.float32(self.dim_head)
        )
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        h = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, N, inner)
        h = nn.Dense(self.dim)(h)
        if train and self.layer_dropout > 0.0:
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - self.layer_dropout
            )
            h = h * keep
        x = x + h

        # --- feed-forward branch ---
        h = self._norm()(x)
        h = nn.Dense(self.dim * self.ff_mult)(h)
        h = nn.gelu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.dim)(h)
        if train and self.layer_dropout > 0.0:
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - self.layer_dropout
            )
            h = h * keep
        return x + h


class Upscale(nn.Module):
    """Stretch LF token embeddings to the HF grid length
    (reference bidirectional_transformer.py:12-30)."""

    out_dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, x, upscale_size: int, train: bool = False):
        # x: (B, N, D) -> (B, M, D)
        x = jnp.swapaxes(x, 1, 2)  # (B, D, N)
        x = interp_nearest(x, upscale_size)  # (B, D, M)
        x = jnp.swapaxes(x, 1, 2)  # (B, M, D) channel-last for convs
        x = nn.Conv(self.hidden_dim, (3,), padding="SAME")(x)
        x = nn.gelu(x)
        x = batch_norm(train)(x)
        x = nn.Conv(self.out_dim, (3,), padding="SAME")(x)
        return x


class BidirectionalTransformer(nn.Module):
    kind: str  # "lf" | "hf"
    num_tokens: int
    codebook_size_l: int
    codebook_size_h: int
    embed_dim: int
    hidden_dim: int
    n_layers: int
    heads: int
    ff_mult: int
    use_rmsnorm: bool
    p_unconditional: float
    n_classes: int
    model_dropout: float = 0.3
    emb_dropout: float = 0.3
    # x-transformers' ContinuousTransformerWrapper creates project_in/out
    # Linears whenever dim_in/dim_out are passed — even square ones (the
    # reference's LF prior trains a 128->128 pair). Fresh training here
    # omits square projections (pure overhead); imported reference
    # checkpoints set this flag so their trained square projections load
    # verbatim (utils/import_reference.stage2_from_state_dict). The flag
    # travels in the stage-2 checkpoint meta.
    force_projections: bool = False

    @property
    def in_dim(self) -> int:
        return self.embed_dim if self.kind == "lf" else 2 * self.embed_dim

    @property
    def mask_token_l(self) -> int:
        return self.codebook_size_l

    @property
    def mask_token_h(self) -> int:
        return self.codebook_size_h

    def _class_embedding(self, cls_table, class_condition, batch, train):
        if class_condition is None:
            idx = jnp.full((batch, 1), self.n_classes, jnp.int32)
        else:
            idx = class_condition.astype(jnp.int32).reshape(batch, 1)
            if train and self.p_unconditional > 0.0:
                drop = (
                    jax.random.uniform(self.make_rng("dropout"), idx.shape)
                    <= self.p_unconditional
                )
                idx = jnp.where(drop, self.n_classes, idx)
        return cls_table(idx)  # (B, 1, in_dim)

    def _token_dropout(self, s, emb, mask_token, train):
        """Dropout on token embeddings, exempting mask-token positions
        (reference :152-164)."""
        if not train or self.emb_dropout <= 0.0:
            return emb
        dropped = nn.Dropout(self.emb_dropout, deterministic=False)(emb)
        is_mask = (s == mask_token)[:, :, None]
        return jnp.where(is_mask, emb, dropped)

    @nn.compact
    def __call__(
        self,
        s_l: jax.Array,
        s_h: Optional[jax.Array] = None,
        class_condition: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        assert self.kind in ("lf", "hf")
        B = s_l.shape[0]
        K_l, K_h = self.codebook_size_l, self.codebook_size_h

        tok_emb_l = nn.Embed(K_l + 1, self.embed_dim, name="tok_emb_l")
        pos_emb = nn.Embed(self.num_tokens + 1, self.in_dim, name="pos_emb")
        cls_emb = nn.Embed(self.n_classes + 1, self.in_dim, name="class_emb")

        if self.kind == "lf":
            emb = tok_emb_l(s_l)
            emb = self._token_dropout(s_l, emb, K_l, train)
            out_table = tok_emb_l
            out_codes = K_l
        else:
            assert s_h is not None, "HF transformer needs both token sets"
            tok_emb_h = nn.Embed(K_h + 1, self.embed_dim, name="tok_emb_h")
            emb_l = tok_emb_l(s_l)
            emb_h = tok_emb_h(s_h)
            emb_l = self._token_dropout(s_l, emb_l, K_l, train)
            emb_h = self._token_dropout(s_h, emb_h, K_h, train)
            emb_l = Upscale(self.embed_dim, 2 * self.embed_dim, name="projector")(
                emb_l, s_h.shape[1], train
            )
            emb = jnp.concatenate([emb_l, emb_h], axis=-1)
            out_table = tok_emb_h
            out_codes = K_h

        n = emb.shape[1]
        positions = pos_emb(jnp.arange(n))[None]  # (1, n, in_dim)
        emb = emb + positions
        cls = self._class_embedding(cls_emb, class_condition, B, train)
        h = jnp.concatenate([cls, emb], axis=1)  # (B, 1+n, in_dim)

        # x-transformers ContinuousTransformerWrapper surface
        if self.in_dim != self.hidden_dim or self.force_projections:
            h = nn.Dense(self.hidden_dim, name="project_in")(h)
        h = nn.LayerNorm(name="post_emb_norm")(h)
        for i in range(self.n_layers):
            h = EncoderBlock(
                dim=self.hidden_dim,
                heads=self.heads,
                ff_mult=self.ff_mult,
                use_rmsnorm=self.use_rmsnorm,
                dropout=self.model_dropout,
                layer_dropout=self.model_dropout,
                name=f"block_{i}",
            )(h, train)
        h = (nn.RMSNorm() if self.use_rmsnorm else nn.LayerNorm())(h)
        if self.in_dim != self.hidden_dim or self.force_projections:
            h = nn.Dense(self.in_dim, name="project_out")(h)

        # prediction head + weight-tied logits (reference :111-119,186-192)
        h = nn.Dense(self.embed_dim, name="pred_head")(h[:, 1:, :])
        h = nn.gelu(h)
        h = nn.LayerNorm(epsilon=1e-12, name="pred_norm")(h)
        bias = self.param(
            "logit_bias", nn.initializers.zeros_init(),
            (self.num_tokens, out_codes + 1),
        )
        logits = jnp.einsum("bnd,kd->bnk", h, out_table.embedding) + bias
        return logits[:, :, :-1]  # drop the mask-token logit
