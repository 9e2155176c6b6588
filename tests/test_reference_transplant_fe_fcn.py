"""Weight-transplant parity for the FCN classifier and the FidelityEnhancer
U-Net vs the reference's OWN torch modules with identical weights.

Extends tests/test_reference_transplant.py (stage-1 conv stacks) to the two
remaining conv models:

  - FCNBaseline (timevqvae/models/fcn.py:65-101) — the FID/IS feature
    network; feature-vector parity here is what makes FID numbers
    comparable across the two frameworks.
  - Unet1D (timevqvae/models/fidelity_enhancer.py:289-464) — the stage-3
    fidelity enhancer: weight-standardized convs, GroupNorm+Snake blocks,
    linear/full attention under PreNorm residuals, down/up paths with
    linear-resize skips, and the 1-3-3 replicate-padded head.

Every parameter AND every norm running stat is randomized before the copy
(fresh stats are 0/1, which would hide mean/var layout mistakes). Skips
cleanly when torch or /root/reference is absent.
"""

import os
import sys

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
sys.path.insert(0, os.path.abspath(TOOLS))

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

import refshim  # noqa: E402

if not refshim.reference_available():
    pytest.skip("/root/reference not present", allow_module_level=True)


@pytest.fixture(scope="module", autouse=True)
def _reference_stubs():
    installed = refshim.install()
    yield
    refshim.uninstall(installed)


def _t2n(t):
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def _conv1d(m, bias=True):
    # torch Conv1d weight (O, I, k) -> flax (k, I, O)
    p = {"kernel": _t2n(m.weight).transpose(2, 1, 0)}
    if bias:
        p["bias"] = _t2n(m.bias)
    return p


def _randomize(module, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.empty_like(p).uniform_(-0.4, 0.4, generator=g))
        for m in module.modules():
            if isinstance(
                m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)
            ):
                m.running_mean.copy_(
                    torch.empty_like(m.running_mean).uniform_(
                        -0.3, 0.3, generator=g
                    )
                )
                m.running_var.copy_(
                    torch.empty_like(m.running_var).uniform_(
                        0.5, 1.5, generator=g
                    )
                )
            if m.__class__.__name__ == "SnakeActivation" and hasattr(m, "a"):
                m.a.abs_().clamp_(min=0.2)


# --- FCN ---------------------------------------------------------------------


def test_fcn_transplant_matches_reference():
    import jax.numpy as jnp
    from timevqvae.models.fcn import FCNBaseline

    from tvqvae_tpu.models.fcn import FCN

    C, NCLS, B, L = 4, 5, 3, 97  # odd L exercises the uneven same-padding
    ref = FCNBaseline(in_channels=C, num_pred_classes=NCLS)
    _randomize(ref, seed=5)
    ref.eval()

    params, stats = {}, {}
    for i, block in enumerate(ref.layers):
        conv, bn, _ = block.layers
        params[f"Conv_{i}"] = _conv1d(conv)
        params[f"BatchNorm_{i}"] = {
            "scale": _t2n(bn.weight),
            "bias": _t2n(bn.bias),
        }
        stats[f"BatchNorm_{i}"] = {
            "mean": _t2n(bn.running_mean),
            "var": _t2n(bn.running_var),
        }
    params["Dense_0"] = {
        "kernel": _t2n(ref.final.weight).T,
        "bias": _t2n(ref.final.bias),
    }

    x = np.random.default_rng(0).normal(size=(B, C, L)).astype(np.float32)
    with torch.no_grad():
        logits_ref = ref(torch.from_numpy(x)).numpy()
        feats_ref = ref(torch.from_numpy(x), return_feature_vector=True).numpy()

    fcn = FCN(n_classes=NCLS)
    variables = {"params": params, "batch_stats": stats}
    logits = np.asarray(fcn.apply(variables, jnp.asarray(x), False))
    feats = np.asarray(fcn.apply(variables, jnp.asarray(x), False, True))

    np.testing.assert_allclose(feats, feats_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(logits, logits_ref, rtol=2e-4, atol=2e-4)


# --- FidelityEnhancer U-Net --------------------------------------------------


def _snake(m):
    return {"a": _t2n(m.a).reshape(-1)}


def _gn(m):
    return {"scale": _t2n(m.weight), "bias": _t2n(m.bias)}


def _ws(m):
    # standardization happens in forward on both sides; raw weights copy over
    return _conv1d(m)


def _unet_block(b):
    # reference Block (proj/norm/act) -> our UnetBlock
    return {
        "WSConv1d_0": _ws(b.proj),
        "GroupNorm_0": _gn(b.norm),
        "Snake_0": _snake(b.act),
    }


def _resnet(rb):
    p = {
        "UnetBlock_0": _unet_block(rb.block1),
        "UnetBlock_1": _unet_block(rb.block2),
    }
    if isinstance(rb.res_conv, torch.nn.Conv1d):
        p["Conv_0"] = _conv1d(rb.res_conv)
    return p


def _chan_ln(ln):
    return {"g": _t2n(ln.g).reshape(-1)}


def _linear_attn(a):
    return {
        "Conv_0": _conv1d(a.to_qkv, bias=False),
        "Conv_1": _conv1d(a.to_out[0]),
        "ChanLayerNorm_0": _chan_ln(a.to_out[1]),
    }


def _full_attn(a):
    return {
        "Conv_0": _conv1d(a.to_qkv, bias=False),
        "Conv_1": _conv1d(a.to_out),
    }


def _convert_unet(ref):
    """Walk the reference Unet1D in our __call__ order, emitting flax
    auto-names. Note: attention modules are constructed in Unet1D's compact
    scope and only *passed* to _PreNormResidual, so flax registers their
    params at the Unet1D level (LinearAttention1d_k / Attention1d_0) while
    _PreNormResidual_i holds just its ChanLayerNorm."""
    p = {"Conv_0": _conv1d(ref.init_conv)}
    ci, ri, ai, li = 1, 0, 0, 0

    def put_res(rb):
        nonlocal ri
        p[f"ResnetBlock1d_{ri}"] = _resnet(rb)
        ri += 1

    def put_attn(res, linear):
        nonlocal ai, li
        prenorm = res.fn
        p[f"_PreNormResidual_{ai}"] = {
            "ChanLayerNorm_0": _chan_ln(prenorm.norm)
        }
        ai += 1
        if linear:
            p[f"LinearAttention1d_{li}"] = _linear_attn(prenorm.fn)
            li += 1
        else:
            p["Attention1d_0"] = _full_attn(prenorm.fn)

    def put_conv(m):
        nonlocal ci
        p[f"Conv_{ci}"] = _conv1d(m)
        ci += 1

    for block1, block2, attn, down in ref.downs:
        put_res(block1)
        put_res(block2)
        put_attn(attn, linear=True)
        put_conv(down if isinstance(down, torch.nn.Conv1d) else down[1])

    put_res(ref.mid_block1)
    put_attn(ref.mid_attn, linear=False)
    put_res(ref.mid_block2)

    for block1, block2, attn, up in ref.ups:
        put_res(block1)
        put_res(block2)
        put_attn(attn, linear=True)
        put_conv(up if isinstance(up, torch.nn.Conv1d) else up[1])

    put_conv(ref.last_up[1])
    put_res(ref.final_res_block)
    for conv in ref.final_conv:
        put_conv(conv)
    return p


def test_unet1d_transplant_matches_reference():
    import jax
    import jax.numpy as jnp
    from timevqvae.models.fidelity_enhancer import Unet1D as RefUnet

    from tvqvae_tpu.models.fidelity_enhancer import Unet1D

    DIM, C, B, L, GROUPS = 8, 3, 2, 64, 4
    ref = RefUnet(
        dim=DIM, channels=C, dim_mults=(1, 2, 4, 8),
        resnet_block_groups=GROUPS, dropout=0.0,
    )
    _randomize(ref, seed=17)
    ref.eval()

    params = _convert_unet(ref)

    ours = Unet1D(
        dim=DIM, channels=C, dim_mults=(1, 2, 4, 8),
        resnet_block_groups=GROUPS, dropout=0.0,
    )
    x = np.random.default_rng(3).normal(size=(B, C, L)).astype(np.float32)
    xl = jnp.transpose(jnp.asarray(x), (0, 2, 1))  # (B, L, C)

    # structural check: converted tree must match an init tree exactly, so
    # any auto-naming drift fails loudly instead of silently using init
    # weights for a missed leaf
    init = ours.init(jax.random.PRNGKey(0), xl, False)["params"]
    conv_shapes = jax.tree_util.tree_map(lambda a: tuple(a.shape), params)
    init_shapes = jax.tree_util.tree_map(lambda a: tuple(a.shape), init)
    assert conv_shapes == init_shapes

    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x)).numpy()  # (B, C, L)

    out = ours.apply({"params": params}, xl, False)
    out = np.transpose(np.asarray(out), (0, 2, 1))

    assert out.shape == out_ref.shape
    np.testing.assert_allclose(out, out_ref, rtol=5e-4, atol=5e-4)
