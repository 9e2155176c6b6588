"""Transplant parity: the reference's OWN BidirectionalTransformer (real
code, reference bidirectional_transformer.py:33-251) running on the
functional x-transformers shim (tools/xtshim.py) vs this repo's flax prior.

Closes the PARITY.md D6 caveat ("x-transformers is not installed, so the
prior has no weight-transplant test against the reference's own module"):
with xtshim providing the ContinuousTransformerWrapper/Encoder subset, the
reference module itself now constructs and runs, its state_dict walks
through utils/import_reference._prior_from_state_dict, and the imported
flax prior must match its logits. This also pins the exact shim the
cross-framework showdown (tools/showdown.py) trains the reference arm with.

Tolerance 2e-3: exact-erf vs tanh GELU in the pred head (the same bar as
tests/test_import_stage2.py / the transformer oracle test).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import refshim  # noqa: E402

pytestmark = pytest.mark.skipif(
    not refshim.reference_available(), reason="/root/reference not present"
)

E, HID_L, HID_H = 8, 12, 10   # embed 8; both wrappers non-square
N_TOK_L, N_TOK_H = 5, 10
K_L, K_H = 6, 7
NCLS, HEADS, FF_MULT = 3, 1, 1
B = 2


@pytest.fixture()
def ref_modules():
    installed = refshim.install()
    try:
        from timevqvae.models.bidirectional_transformer import (
            BidirectionalTransformer as RefBT,
        )

        yield RefBT
    finally:
        refshim.uninstall(installed)


def _randomize(module, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.empty_like(p).uniform_(-0.4, 0.4, generator=g))
        for m in module.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.uniform_(-0.3, 0.3, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)


def _make_ref(RefBT, kind, num_tokens, hidden, n_layers=2):
    return RefBT(
        kind=kind,
        num_tokens=num_tokens,
        codebook_sizes={"lf": K_L, "hf": K_H},
        embed_dim=E,
        hidden_dim=hidden,
        n_layers=n_layers,
        heads=HEADS,
        ff_mult=FF_MULT,
        use_rmsnorm=True,
        p_unconditional=0.2,
        n_classes=NCLS,
        model_dropout=0.3,
        emb_dropout=0.3,
    )


def test_reference_prior_via_xtshim_matches_flax(ref_modules):
    import jax.numpy as jnp

    from tvqvae_tpu.models.transformer import BidirectionalTransformer
    from tvqvae_tpu.utils.import_reference import _prior_from_state_dict

    RefBT = ref_modules
    t_l = _make_ref(RefBT, "lf", N_TOK_L, HID_L)
    t_h = _make_ref(RefBT, "hf", N_TOK_H, HID_H)
    _randomize(t_l, 11)
    _randomize(t_h, 22)
    t_l.eval(), t_h.eval()

    sd_l = {k: v.numpy() for k, v in t_l.state_dict().items()}
    sd_h = {k: v.numpy() for k, v in t_h.state_dict().items()}
    p_l, s_l_stats, inf_l = _prior_from_state_dict(sd_l, "lf")
    p_h, s_h_stats, inf_h = _prior_from_state_dict(sd_h, "hf")
    assert inf_l["hidden_dim"] == HID_L
    assert inf_h["hidden_dim"] == HID_H

    mk = lambda kind, n_tok, hid: BidirectionalTransformer(
        kind=kind, num_tokens=n_tok, codebook_size_l=K_L,
        codebook_size_h=K_H, embed_dim=E, hidden_dim=hid, n_layers=2,
        heads=HEADS, ff_mult=FF_MULT, use_rmsnorm=True, p_unconditional=0.2,
        n_classes=NCLS,
    )
    f_l, f_h = mk("lf", N_TOK_L, HID_L), mk("hf", N_TOK_H, HID_H)

    rng = np.random.default_rng(5)
    s_l = rng.integers(0, K_L + 1, (B, N_TOK_L))
    s_h = rng.integers(0, K_H + 1, (B, N_TOK_H))
    y = rng.integers(0, NCLS, (B, 1))

    for cond in (None, y):
        tc = None if cond is None else torch.from_numpy(cond)
        jc = None if cond is None else jnp.asarray(cond)
        with torch.no_grad():
            ref_out_l = t_l(torch.from_numpy(s_l),
                            class_condition=tc).numpy()
            ref_out_h = t_h(torch.from_numpy(s_l), torch.from_numpy(s_h),
                            class_condition=tc).numpy()
        got_l = np.asarray(f_l.apply(
            {"params": p_l}, jnp.asarray(s_l), None, jc, False
        ))
        got_h = np.asarray(f_h.apply(
            {"params": p_h, "batch_stats": s_h_stats},
            jnp.asarray(s_l), jnp.asarray(s_h), jc, False,
        ))
        np.testing.assert_allclose(got_l, ref_out_l, rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(got_h, ref_out_h, rtol=2e-3, atol=2e-3)


def test_xtshim_trains(ref_modules):
    """The shimmed reference prior must BACKPROP (the showdown trains it):
    one AdamW step on a masked-CE-style loss moves the parameters."""
    RefBT = ref_modules
    t_l = _make_ref(RefBT, "lf", N_TOK_L, HID_L, n_layers=1)
    t_l.train()
    opt = torch.optim.AdamW(t_l.parameters(), lr=1e-3)
    s = torch.randint(0, K_L + 1, (B, N_TOK_L))
    y = torch.randint(0, NCLS, (B, 1))
    before = t_l.tok_emb_l.weight.detach().clone()
    logits = t_l(s, class_condition=y)
    loss = torch.nn.functional.cross_entropy(
        logits.reshape(-1, K_L), s.clamp(max=K_L - 1).reshape(-1)
    )
    opt.zero_grad()
    loss.backward()
    opt.step()
    assert not torch.allclose(before, t_l.tok_emb_l.weight)
    assert torch.isfinite(loss)
