"""Functional torch stand-in for the x_transformers subset the reference's
prior transformer instantiates (reference bidirectional_transformer.py:92-110:
ContinuousTransformerWrapper(dim_in, dim_out, max_seq_len, use_abs_pos_emb=
False, post_emb_norm=True, attn_layers=Encoder(pre_norm=True, dim, depth,
heads, attn_dim_head=64, use_rmsnorm, ff_mult, layer_dropout, attn_dropout,
ff_dropout))).

x_transformers is not installed in this environment; refshim previously
stubbed it with non-functional placeholders, which satisfied imports but
could not TRAIN the reference's stage-2/3 — the cross-framework quality
showdown (VERDICT r4 next-1) needs the reference pipeline to actually run.
This module implements exactly the configuration subset above, with the same
semantics the repo's numpy transcription pins for its own flax prior
(tests/test_transformer_oracle.py): pre-norm blocks (RMSNorm/LayerNorm ->
MHA -> residual; norm -> Dense -> GELU -> Dense -> residual), scale
1/sqrt(dim_head), final norm, post-emb LayerNorm after project_in, and
whole-branch layer dropout without rescaling. tests/test_xtshim.py pins this
torch implementation against the repo's flax module by weight transplant.

This is TEST/HARNESS code (the reference arm of tools/showdown.py), not
product code.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class RMSNorm(nn.Module):
    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.eps = eps
        self.g = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        ms = x.float().pow(2).mean(dim=-1, keepdim=True)
        return (x.float() * torch.rsqrt(ms + self.eps)).to(x.dtype) * self.g


def _make_norm(dim, use_rmsnorm):
    return RMSNorm(dim) if use_rmsnorm else nn.LayerNorm(dim, eps=1e-6)


class _Attention(nn.Module):
    def __init__(self, dim, heads, dim_head, dropout):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head = heads, dim_head
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_k = nn.Linear(dim, inner, bias=False)
        self.to_v = nn.Linear(dim, inner, bias=False)
        self.to_out = nn.Linear(inner, dim)
        self.attn_dropout = nn.Dropout(dropout)

    def forward(self, x):
        B, N, _ = x.shape
        h, d = self.heads, self.dim_head
        q = self.to_q(x).view(B, N, h, d).transpose(1, 2)  # (B h N d)
        k = self.to_k(x).view(B, N, h, d).transpose(1, 2)
        v = self.to_v(x).view(B, N, h, d).transpose(1, 2)
        attn = (q @ k.transpose(-2, -1)) / math.sqrt(d)
        attn = self.attn_dropout(attn.softmax(dim=-1))
        out = (attn @ v).transpose(1, 2).reshape(B, N, h * d)
        return self.to_out(out)


class _FeedForward(nn.Module):
    def __init__(self, dim, ff_mult, dropout):
        super().__init__()
        self.net = nn.Sequential(
            nn.Linear(dim, dim * ff_mult),
            nn.GELU(approximate="tanh"),
            nn.Dropout(dropout),
            nn.Linear(dim * ff_mult, dim),
        )

    def forward(self, x):
        return self.net(x)


class Encoder(nn.Module):
    """x_transformers.Encoder subset: pre-norm, fixed-depth, non-causal.

    Layer layout mirrors the real library's state_dict shape — an
    alternating ModuleList of (norm, Attention) and (norm, FeedForward)
    pairs ('layers.{i}.0' = pre-norm, 'layers.{i}.1' = branch) with the
    final norm at the Encoder level — so checkpoints trained through this
    shim walk through utils/import_reference._prior_from_state_dict
    unchanged (the bridge classifies blocks structurally by their keys).
    """

    def __init__(self, pre_norm=True, dim=None, depth=None, heads=None,
                 attn_dim_head=64, use_rmsnorm=True, ff_mult=1,
                 layer_dropout=0.0, attn_dropout=0.0, ff_dropout=0.0,
                 **kwargs):
        super().__init__()
        assert pre_norm, "only the pre-norm configuration is implemented"
        self.dim = dim
        self.layer_dropout = layer_dropout
        self.layers = nn.ModuleList()
        for _ in range(depth):
            self.layers.append(nn.ModuleList([
                _make_norm(dim, use_rmsnorm),
                _Attention(dim, heads, attn_dim_head, attn_dropout),
            ]))
            self.layers.append(nn.ModuleList([
                _make_norm(dim, use_rmsnorm),
                _FeedForward(dim, ff_mult, ff_dropout),
            ]))
        self.final_norm = _make_norm(dim, use_rmsnorm)

    def _branch_keep(self):
        # whole-branch dropout, one Bernoulli per branch per call, no
        # 1/keep rescale — the semantics the repo's flax EncoderBlock uses
        if self.training and self.layer_dropout > 0.0:
            return float(torch.rand(()) >= self.layer_dropout)
        return 1.0

    def forward(self, x):
        for norm, branch in self.layers:
            x = x + branch(norm(x)) * self._branch_keep()
        return self.final_norm(x)


class ContinuousTransformerWrapper(nn.Module):
    """x_transformers.ContinuousTransformerWrapper subset: project_in ->
    (no abs pos emb) -> post_emb_norm -> attn_layers -> project_out."""

    def __init__(self, dim_in=None, dim_out=None, max_seq_len=None,
                 use_abs_pos_emb=False, post_emb_norm=False,
                 attn_layers=None, **kwargs):
        super().__init__()
        assert not use_abs_pos_emb, \
            "reference passes use_abs_pos_emb=False (pos emb added outside)"
        dim = attn_layers.dim
        self.project_in = (nn.Linear(dim_in, dim)
                           if dim_in is not None else nn.Identity())
        self.post_emb_norm = (nn.LayerNorm(dim, eps=1e-6)
                              if post_emb_norm else nn.Identity())
        self.attn_layers = attn_layers
        self.project_out = (nn.Linear(dim, dim_out)
                            if dim_out is not None else nn.Identity())

    def forward(self, x, **kwargs):
        x = self.project_in(x)
        x = self.post_emb_norm(x)
        x = self.attn_layers(x)
        return self.project_out(x)


def make_module():
    """Build a fake `x_transformers` module exposing this functional shim."""
    import types

    mod = types.ModuleType("x_transformers")
    mod.ContinuousTransformerWrapper = ContinuousTransformerWrapper
    mod.Encoder = Encoder
    return mod
