"""stage2.ckpt import: reference prior transformers -> framework checkpoint.

x-transformers is not installed here, so (like the transformer oracle test)
the reference side is an INDEPENDENT from-scratch torch transcription of the
exact stack the reference builds (bidirectional_transformer.py:33-251:
ContinuousTransformerWrapper with always-present project_in/out + pre-norm
RMSNorm Encoder, dim_head 64; pred_head Linear->GELU->LayerNorm(1e-12);
weight-tied logits; HF Upscale projector), emitting state-dict keys in
x-transformers' naming. The converter is STRUCTURAL, so a second test feeds
it the older naming variant (flat norm slot, `net.*` feed-forward,
`to_out.0` Sequential, biasless Linears) and pins identical output.

Tolerance: the reference uses exact-erf GELU, flax nn.gelu is the tanh
approximation — agreement is ~1e-3, not 1e-6 (same bar as the oracle test).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn

from tvqvae_tpu.utils.import_reference import stage2_from_state_dict  # noqa: E402

# heavy big-compile/mesh tests: slow tier (round-5 fast-tier
# budget, VERDICT r4 next-6 — `make test` still runs them)
pytestmark = pytest.mark.slow


# tiny geometry: embed 8; LF square wrapper (8->8, the fold-impossible
# case), HF non-square (16->12->16); dim_head 64 is the reference constant
E, HID_L, HID_H = 8, 8, 12
N_TOK_L, N_TOK_H = 5, 10
K_L, K_H = 6, 7
NCLS, HEADS, DIM_HEAD, FF_MULT = 3, 1, 64, 1
B = 2


# --- from-scratch torch transcription of the x-transformers stack ----------


class XTRMSNorm(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.scale = dim ** 0.5
        self.g = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        return torch.nn.functional.normalize(x, dim=-1) * self.scale * self.g


class XTAttention(nn.Module):
    def __init__(self, dim, heads, dim_head, out_bias=True, seq_out=False):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head = heads, dim_head
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_k = nn.Linear(dim, inner, bias=False)
        self.to_v = nn.Linear(dim, inner, bias=False)
        out = nn.Linear(inner, dim, bias=out_bias)
        # newer x-transformers: bare Linear; older: Sequential(Linear, ...)
        self.to_out = nn.Sequential(out, nn.Dropout(0.0)) if seq_out else out

    def forward(self, x):
        b, n, _ = x.shape
        h, d = self.heads, self.dim_head
        q = self.to_q(x).view(b, n, h, d)
        k = self.to_k(x).view(b, n, h, d)
        v = self.to_v(x).view(b, n, h, d)
        attn = torch.einsum("bqhd,bkhd->bhqk", q, k) / d ** 0.5
        attn = attn.softmax(dim=-1)
        o = torch.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, h * d)
        return self.to_out(o)


class XTFeedForward(nn.Module):
    """Newer naming: ff.0.0 (Linear) / ff.2 (Linear)."""

    def __init__(self, dim, mult, bias=True):
        super().__init__()
        inner = dim * mult
        self.ff = nn.Sequential(
            nn.Sequential(nn.Linear(dim, inner, bias=bias), nn.GELU()),
            nn.Dropout(0.0),
            nn.Linear(inner, dim, bias=bias),
        )

    def forward(self, x):
        return self.ff(x)


class XTFeedForwardOld(nn.Module):
    """Older naming: net.0.0 / net.3, biasless."""

    def __init__(self, dim, mult):
        super().__init__()
        inner = dim * mult
        self.net = nn.Sequential(
            nn.Sequential(nn.Linear(dim, inner, bias=False), nn.GELU()),
            nn.Identity(),
            nn.Dropout(0.0),
            nn.Linear(inner, dim, bias=False),
        )

    def forward(self, x):
        return self.net(x)


class XTEncoder(nn.Module):
    """Pre-norm Encoder: layers.{i} = ModuleList([norms, block]) with the
    norm nested one ModuleList down (newer naming) or flat (older)."""

    def __init__(self, dim, depth, heads, ff_mult, nested_norm=True,
                 old_ff=False, attn_out_bias=True, attn_seq_out=False):
        super().__init__()
        self.layers = nn.ModuleList()
        for _ in range(depth):
            for block in (
                XTAttention(dim, heads, DIM_HEAD, out_bias=attn_out_bias,
                            seq_out=attn_seq_out),
                (XTFeedForwardOld(dim, ff_mult) if old_ff
                 else XTFeedForward(dim, ff_mult)),
            ):
                norm = XTRMSNorm(dim)
                slot = nn.ModuleList([norm]) if nested_norm else norm
                self.layers.append(nn.ModuleList([slot, block]))
        self.final_norm = XTRMSNorm(dim)
        self.nested_norm = nested_norm

    def forward(self, x):
        for slot, block in self.layers:
            norm = slot[0] if self.nested_norm else slot
            x = x + block(norm(x))
        return self.final_norm(x)


class XTWrapper(nn.Module):
    """ContinuousTransformerWrapper: project_in -> post_emb_norm ->
    attn_layers (incl. final norm) -> project_out. The projections exist
    even when square (the reference always passes dim_in/dim_out)."""

    def __init__(self, dim_in, dim, **enc_kw):
        super().__init__()
        self.project_in = nn.Linear(dim_in, dim)
        self.post_emb_norm = nn.LayerNorm(dim)
        self.attn_layers = XTEncoder(dim, **enc_kw)
        self.project_out = nn.Linear(dim, dim_in)

    def forward(self, x):
        x = self.project_in(x)
        x = self.post_emb_norm(x)
        x = self.attn_layers(x)
        return self.project_out(x)


class RefUpscale(nn.Module):
    """bidirectional_transformer.py:12-30."""

    def __init__(self, in_ch, out_ch, h_dim):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv1d(in_ch, h_dim, 3, padding=1),
            nn.GELU(),
            nn.BatchNorm1d(h_dim),
            nn.Conv1d(h_dim, out_ch, 3, padding=1),
        )

    def forward(self, x, upscale_size):
        x = x.transpose(1, 2)
        x = torch.nn.functional.interpolate(x, size=(upscale_size,),
                                            mode="nearest")
        x = self.conv(x)
        return x.transpose(1, 2)


class RefPrior(nn.Module):
    """Reference BidirectionalTransformer (eval semantics only)."""

    def __init__(self, kind, num_tokens, hidden, **enc_kw):
        super().__init__()
        self.kind = kind
        self.n_classes = NCLS
        in_dim = E if kind == "lf" else 2 * E
        K = K_L if kind == "lf" else K_H
        self.tok_emb_l = nn.Embedding(K_L + 1, E)
        if kind == "hf":
            self.tok_emb_h = nn.Embedding(K_H + 1, E)
            self.projector = RefUpscale(E, E, 2 * E)
        self.pos_emb = nn.Embedding(num_tokens + 1, in_dim)
        self.class_condition_emb = nn.Embedding(NCLS + 1, in_dim)
        self.blocks = XTWrapper(in_dim, hidden, depth=2, heads=HEADS,
                                ff_mult=FF_MULT, **enc_kw)
        self.pred_head = nn.Sequential(
            nn.Linear(in_dim, E), nn.GELU(), nn.LayerNorm(E, eps=1e-12),
        )
        self.bias = nn.Parameter(torch.zeros(num_tokens, K + 1))

    def forward(self, s_l, s_h=None, class_condition=None):
        if self.kind == "lf":
            emb = self.tok_emb_l(s_l)
            out_table = self.tok_emb_l
        else:
            emb_l = self.projector(self.tok_emb_l(s_l),
                                   upscale_size=s_h.shape[1])
            emb = torch.cat([emb_l, self.tok_emb_h(s_h)], dim=-1)
            out_table = self.tok_emb_h
        n = emb.shape[1]
        emb = emb + self.pos_emb.weight[:n, :]
        if class_condition is None:
            idx = torch.full((emb.shape[0], 1), self.n_classes,
                             dtype=torch.long)
        else:
            idx = class_condition.long().view(-1, 1)
        cls = self.class_condition_emb(idx)
        h = torch.cat([cls, emb], dim=1)
        h = self.blocks(h)
        h = self.pred_head(h)[:, 1:, :]
        logits = h @ out_table.weight.T + self.bias
        return logits[:, :, :-1]


def _randomize(module, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.empty_like(p).uniform_(-0.4, 0.4, generator=g))
        for m in module.modules():
            if isinstance(m, nn.BatchNorm1d):
                m.running_mean.uniform_(-0.3, 0.3, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)


def _stage2_sd(**enc_kw):
    """Lightning-style stage2.ckpt state dict (maskgit.transformer_* keys +
    frozen stage-1 junk the importer must ignore)."""
    t_l = RefPrior("lf", N_TOK_L, HID_L, **enc_kw)
    t_h = RefPrior("hf", N_TOK_H, HID_H, **enc_kw)
    _randomize(t_l, 11)
    _randomize(t_h, 22)
    t_l.eval(), t_h.eval()
    sd = {}
    for name, m in (("transformer_l", t_l), ("transformer_h", t_h)):
        for k, v in m.state_dict().items():
            sd[f"maskgit.{name}.{k}"] = v
    sd["maskgit.encoder_l.block.0.weight"] = torch.zeros(2, 2)
    sd["maskgit.stage1.vq_model_l._codebook.embed"] = torch.zeros(3, 3)
    return t_l, t_h, {"state_dict": sd, "hyper_parameters": {}}


def _flax_models(force_projections):
    from tvqvae_tpu.models.transformer import BidirectionalTransformer

    mk = lambda kind, n_tok, hid: BidirectionalTransformer(
        kind=kind, num_tokens=n_tok, codebook_size_l=K_L,
        codebook_size_h=K_H, embed_dim=E, hidden_dim=hid, n_layers=2,
        heads=HEADS, ff_mult=FF_MULT, use_rmsnorm=True, p_unconditional=0.2,
        n_classes=NCLS, force_projections=force_projections,
    )
    return mk("lf", N_TOK_L, HID_L), mk("hf", N_TOK_H, HID_H)


def _compare_forward(t_l, t_h, params, h_stats, force_projections):
    import jax.numpy as jnp

    f_l, f_h = _flax_models(force_projections)
    rng = np.random.default_rng(5)
    s_l = rng.integers(0, K_L + 1, (B, N_TOK_L))
    s_h = rng.integers(0, K_H + 1, (B, N_TOK_H))
    y = rng.integers(0, NCLS, (B, 1))

    for cond in (None, y):
        tc = None if cond is None else torch.from_numpy(cond)
        jc = None if cond is None else jnp.asarray(cond)
        with torch.no_grad():
            ref_l = t_l(torch.from_numpy(s_l), class_condition=tc).numpy()
            ref_h = t_h(torch.from_numpy(s_l), torch.from_numpy(s_h),
                        class_condition=tc).numpy()
        got_l = np.asarray(f_l.apply(
            {"params": params["l"]}, jnp.asarray(s_l), None, jc, False
        ))
        got_h = np.asarray(f_h.apply(
            {"params": params["h"], "batch_stats": h_stats},
            jnp.asarray(s_l), jnp.asarray(s_h), jc, False,
        ))
        # exact-erf vs tanh GELU: ~1e-3 agreement (oracle-test bar)
        np.testing.assert_allclose(got_l, ref_l, rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(got_h, ref_h, rtol=2e-3, atol=2e-3)


def test_stage2_converter_parity_new_naming():
    t_l, t_h, ckpt = _stage2_sd()
    params, h_stats, inferred = stage2_from_state_dict(ckpt)
    assert inferred["force_projections"] is True  # LF wrapper is square
    assert inferred["lf"]["hidden_dim"] == HID_L
    assert inferred["hf"]["hidden_dim"] == HID_H
    assert inferred["lf"]["num_tokens"] == N_TOK_L
    assert inferred["hf"]["codebook_size"] == K_H
    assert inferred["lf"]["n_classes"] == NCLS
    _compare_forward(t_l, t_h, params, h_stats, True)


def test_stage2_converter_parity_old_naming():
    """Older x-transformers naming: flat norm slot, net.* feed-forward,
    Sequential to_out, biasless Linears — same converter, same parity."""
    t_l, t_h, ckpt = _stage2_sd(nested_norm=False, old_ff=True,
                                attn_out_bias=False, attn_seq_out=True)
    params, h_stats, inferred = stage2_from_state_dict(ckpt)
    assert inferred["force_projections"] is True
    _compare_forward(t_l, t_h, params, h_stats, True)


def test_stage2_rejects_non_stage2():
    with pytest.raises(ValueError, match="transformer_l"):
        stage2_from_state_dict({"state_dict": {
            "encoder_l.block.0.weight": torch.zeros(2, 2)}})


def test_stage2_import_cli_roundtrip(tmp_path):
    """Full artifact path: torch.save'd stage2.ckpt (+ the stage-1 ckpt it
    must pair with) -> import_ckpt CLI -> Orbax checkpoint -> the sampler's
    loader path (load_checkpoint + build_transformers with the meta flag),
    output parity against the torch transcription."""
    import os
    import sys

    import yaml

    TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
    sys.path.insert(0, os.path.abspath(TOOLS))
    import refshim

    if not refshim.reference_available():
        pytest.skip("/root/reference not present")
    installed = refshim.install()
    try:
        import jax
        import jax.numpy as jnp

        from test_import_reference import TINY_CFG, _ref_stage1_state_dict
        from tvqvae_tpu.config import Config
        from tvqvae_tpu.models.maskgit import MaskGITSpec, build_transformers
        from tvqvae_tpu.models.stage1 import Stage1Spec
        from tvqvae_tpu.scripts.import_ckpt import main as import_main
        from tvqvae_tpu.utils.checkpoint import load_checkpoint

        cfg_dict = dict(TINY_CFG)
        cfg_dict["MaskGIT"] = {
            "prior_model_l": {"hidden_dim": HID_L, "n_layers": 2,
                              "heads": HEADS, "ff_mult": FF_MULT,
                              "use_rmsnorm": True},
            "prior_model_h": {"hidden_dim": HID_H, "n_layers": 2,
                              "heads": HEADS, "ff_mult": FF_MULT,
                              "use_rmsnorm": True},
        }
        cfg_path = str(tmp_path / "cfg.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg_dict, f)
        cfg = Config.from_yaml(cfg_path)

        # the prior grids must match the stage-1 geometry (TINY_CFG: L=128)
        spec1 = Stage1Spec.from_config(cfg, 128, 2)
        global N_TOK_L, N_TOK_H, K_L, K_H, E
        old = (N_TOK_L, N_TOK_H, K_L, K_H, E)
        N_TOK_L, N_TOK_H = spec1.tokens_l, spec1.tokens_h
        K_L = K_H = 8  # TINY_CFG codebooks
        E = 8  # TINY_CFG hid_dim
        try:
            _, s1_ckpt_obj = _ref_stage1_state_dict()
            t_l, t_h, s2_ckpt_obj = _stage2_sd()
        finally:
            (N_TOK_L, N_TOK_H, K_L, K_H, E) = old

        s1_path = str(tmp_path / "stage1.ckpt")
        s2_path = str(tmp_path / "stage2.ckpt")
        torch.save(s1_ckpt_obj, s1_path)
        torch.save(s2_ckpt_obj, s2_path)
        out_dir = str(tmp_path / "models")
        import_main(["--stage1_ckpt", s1_path, "--stage2_ckpt", s2_path,
                     "--out_dir", out_dir, "--config", cfg_path,
                     "--n_classes", str(NCLS)])

        tree2, meta2 = load_checkpoint(os.path.join(out_dir, "stage2"))
        assert meta2["force_projections"] is True
        f_l, f_h = build_transformers(
            cfg, spec1, NCLS, force_projections=True
        )
        rng = np.random.default_rng(9)
        s_l = rng.integers(0, 9, (B, spec1.tokens_l))
        s_h = rng.integers(0, 9, (B, spec1.tokens_h))
        with torch.no_grad():
            ref_l = t_l(torch.from_numpy(s_l)).numpy()
            ref_h = t_h(torch.from_numpy(s_l),
                        torch.from_numpy(s_h)).numpy()
        got_l = np.asarray(f_l.apply(
            {"params": tree2["params"]["l"]}, jnp.asarray(s_l), None,
            None, False,
        ))
        got_h = np.asarray(f_h.apply(
            {"params": tree2["params"]["h"],
             "batch_stats": tree2["h_stats"]},
            jnp.asarray(s_l), jnp.asarray(s_h), None, False,
        ))
        np.testing.assert_allclose(got_l, ref_l, rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(got_h, ref_h, rtol=2e-3, atol=2e-3)
    finally:
        refshim.uninstall(installed)
