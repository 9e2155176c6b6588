"""Weight-transplant parity: the reference's OWN stage-1 conv stacks vs this
repo's flax modules, with IDENTICAL weights.

The strongest architecture-parity evidence available without the real
dataset: instantiate the reference's torch `VQVAEEncoder` / `VQVAEDecoder`
(timevqvae/models/vq_vae.py:124-264), randomize every parameter AND BatchNorm
running stat, copy the weights into this repo's flax param trees
(tvqvae_tpu/models/vqvae.py), and assert the eval-mode forward outputs agree
to float tolerance on the same inputs. This pins down, in one shot:

  - conv kernel layouts (torch OIHW -> flax HWIO) and padding geometry,
  - replicate-padded strided EncBlock convs (vq_vae.py:65-92),
  - the input-dilated formulation of torch ConvTranspose2d
    (layers.ConvTranspose2dTorch, incl. spatial kernel flip),
  - BatchNorm eval semantics (running stats, eps),
  - Snake activation broadcasting,
  - the decoder tail: band zero-pad -> iSTFT -> linear resize -> residual
    Linear head (vq_vae.py:238-263 vs models/stage1.py decode + TimeHead).

Skips cleanly when torch or /root/reference is absent.
"""

import os
import sys

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
sys.path.insert(0, os.path.abspath(TOOLS))

torch = pytest.importorskip("torch")

import refshim  # noqa: E402

if not refshim.reference_available():
    pytest.skip("/root/reference not present", allow_module_level=True)


@pytest.fixture(scope="module", autouse=True)
def _reference_stubs():
    installed = refshim.install()
    yield
    refshim.uninstall(installed)


# --- torch -> flax weight conversion ---------------------------------------


def _t2n(t):
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def _conv_params(m):
    # torch Conv2d weight (O, I, kh, kw) -> flax (kh, kw, I, O)
    return {
        "kernel": _t2n(m.weight).transpose(2, 3, 1, 0),
        "bias": _t2n(m.bias),
    }


def _convT_params(m):
    # torch ConvTranspose2d weight (I, O, kh, kw); our ConvTranspose2dTorch
    # computes the transposed conv as an input-dilated regular conv, which
    # needs the spatially FLIPPED kernel in (kh, kw, I, O) layout.
    w = _t2n(m.weight)[:, :, ::-1, ::-1]  # flip kh, kw
    return {
        "kernel": np.ascontiguousarray(w.transpose(2, 3, 0, 1)),
        "bias": _t2n(m.bias),
    }


def _bn_params(m):
    return (
        {"scale": _t2n(m.weight), "bias": _t2n(m.bias)},
        {"mean": _t2n(m.running_mean), "var": _t2n(m.running_var)},
    )


def _snake_params(m):
    return {"a": _t2n(m.a).reshape(-1)}


def _enc_block(tb):
    """torch VQVAEEncBlock -> flax EncBlock2d {params, batch_stats}."""
    conv, bn, snake = tb.block[0], tb.block[1], tb.block[2]
    bn_p, bn_s = _bn_params(bn)
    return (
        {"Conv_0": _conv_params(conv), "BatchNorm_0": bn_p,
         "Snake_0": _snake_params(snake)},
        {"BatchNorm_0": bn_s},
    )


def _dec_block(tb):
    """torch VQVAEDecBlock -> flax DecBlock2d {params, batch_stats}."""
    convt, bn, snake = tb.block[0], tb.block[1], tb.block[2]
    bn_p, bn_s = _bn_params(bn)
    return (
        {"ConvTranspose2dTorch_0": _convT_params(convt), "BatchNorm_0": bn_p,
         "Snake_0": _snake_params(snake)},
        {"BatchNorm_0": bn_s},
    )


def _res_block(tb):
    """torch ResBlock -> flax ResBlock2d {params, batch_stats}.

    Reference layer order (vq_vae.py:31-53): Snake, Conv, BN, Snake, Conv,
    Dropout; skip proj is a 1x1 Conv when in_channels != out_channels.
    Flax naming (layers.py ResBlock2d): Snake_0, Conv_0, BatchNorm_0,
    Snake_1, Conv_1[, Conv_2 proj].
    """
    snake0, conv0, bn, snake1, conv1 = (
        tb.convs[0], tb.convs[1], tb.convs[2], tb.convs[3], tb.convs[4]
    )
    bn_p, bn_s = _bn_params(bn)
    params = {
        "Snake_0": _snake_params(snake0),
        "Conv_0": _conv_params(conv0),
        "BatchNorm_0": bn_p,
        "Snake_1": _snake_params(snake1),
        "Conv_1": _conv_params(conv1),
    }
    if not isinstance(tb.proj, torch.nn.Identity):
        params["Conv_2"] = _conv_params(tb.proj)
    return params, {"BatchNorm_0": bn_s}


def _convert_stack(torch_children):
    """Map an ordered list of reference blocks to flax auto-names."""
    from timevqvae.models.vq_vae import ResBlock, VQVAEDecBlock, VQVAEEncBlock

    params, stats = {}, {}
    counters = {"EncBlock2d": 0, "DecBlock2d": 0, "ResBlock2d": 0,
                "ConvTranspose2dTorch": 0}

    def put(kind, p, s):
        name = f"{kind}_{counters[kind]}"
        counters[kind] += 1
        params[name] = p
        if s:
            stats[name] = s

    for tb in torch_children:
        if isinstance(tb, VQVAEEncBlock):
            put("EncBlock2d", *_enc_block(tb))
        elif isinstance(tb, VQVAEDecBlock):
            put("DecBlock2d", *_dec_block(tb))
        elif isinstance(tb, ResBlock):
            put("ResBlock2d", *_res_block(tb))
        elif isinstance(tb, torch.nn.ConvTranspose2d):
            put("ConvTranspose2dTorch", _convT_params(tb), None)
        else:
            raise TypeError(f"unexpected reference block {type(tb)}")
    return params, stats


def _randomize(module, seed):
    """Randomize every parameter and BN running stat (fresh stats are 0/1,
    which would hide mean/var layout mistakes)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.empty_like(p).uniform_(-0.4, 0.4, generator=g))
        for m in module.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
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
    # Snake `a` must stay positive (1/a term)
    with torch.no_grad():
        for m in module.modules():
            if m.__class__.__name__ == "SnakeActivation" and hasattr(m, "a"):
                m.a.abs_().clamp_(min=0.2)


# --- fixtures ----------------------------------------------------------------

B, C, L, NFFT = 2, 2, 128, 4
INIT_DIM, HID_DIM, N_RES = 4, 8, 1
DOWNSAMPLED_WIDTH = 8  # -> 2 halvings at L=128 (token_geometry)


def _geometry():
    from tvqvae_tpu.ops import token_geometry

    return token_geometry(L, NFFT, DOWNSAMPLED_WIDTH)


def test_encoder_transplant_matches_reference():
    import jax
    import jax.numpy as jnp
    from timevqvae.models.vq_vae import VQVAEEncoder as RefEncoder
    from timevqvae.utils import zero_pad_high_freq as ref_pad

    from tvqvae_tpu.models.vqvae import VQVAEEncoder
    from tvqvae_tpu.ops import time_to_timefreq, zero_pad_high_freq

    g = _geometry()
    ref = RefEncoder(
        INIT_DIM, HID_DIM, 2 * C, 2 ** g.num_halvings, N_RES,
        ref_pad, NFFT, frequency_indepence=False,
    )
    _randomize(ref, seed=11)
    ref.eval()

    params, stats = _convert_stack(list(ref.encoder.children()))

    x = np.random.default_rng(0).normal(size=(B, C, L)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x)).numpy()  # (B, hid, H', W')

    enc = VQVAEEncoder(INIT_DIM, HID_DIM, g.num_halvings, N_RES)
    xf = time_to_timefreq(jnp.asarray(x), NFFT)
    xf = zero_pad_high_freq(xf, copy=True)
    xf = jnp.transpose(xf, (0, 2, 3, 1))  # NHWC
    out = enc.apply(
        {"params": params, "batch_stats": stats}, xf, False
    )  # (B, H', W', hid)
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))

    assert out.shape == out_ref.shape
    np.testing.assert_allclose(out, out_ref, rtol=2e-4, atol=2e-4)


def test_decoder_transplant_matches_reference():
    import jax.numpy as jnp
    from timevqvae.models.vq_vae import VQVAEDecoder as RefDecoder
    from timevqvae.utils import zero_pad_high_freq as ref_pad

    from tvqvae_tpu.models.vqvae import TimeHead, VQVAEDecoder
    from tvqvae_tpu.ops import timefreq_to_time, zero_pad_high_freq

    g = _geometry()
    ref = RefDecoder(
        INIT_DIM, HID_DIM, 2 * C, 2 ** g.num_halvings, N_RES, L,
        ref_pad, NFFT, x_channels=C, frequency_indepence=False,
    )
    _randomize(ref, seed=23)
    ref.eval()

    params, stats = _convert_stack(list(ref.decoder.children()))
    # TimeHead: torch Linear weight (out, in) -> flax Dense kernel (in, out)
    head_params = {
        "Dense_0": {
            "kernel": _t2n(ref.linear.weight).T,
            "bias": _t2n(ref.linear.bias),
        }
    }

    z = np.random.default_rng(1).normal(
        size=(B, HID_DIM, g.h_prime, g.w_prime)
    ).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(z)).numpy()  # (B, C, L)

    dec = VQVAEDecoder(INIT_DIM, HID_DIM, 2 * C, g.num_halvings, N_RES)
    zl = jnp.transpose(jnp.asarray(z), (0, 2, 3, 1))  # NHWC
    u = dec.apply({"params": params, "batch_stats": stats}, zl, False)
    u = jnp.transpose(u, (0, 3, 1, 2))  # (B, 2C, H, W'')
    u = zero_pad_high_freq(u)
    xt = timefreq_to_time(u, NFFT)
    out = TimeHead(L).apply({"params": head_params}, xt)

    assert np.asarray(out).shape == out_ref.shape
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=2e-4, atol=2e-4)


def test_conv_transpose_numerics_match_torch():
    """ConvTranspose2dTorch vs torch.nn.ConvTranspose2d on random weights
    (the input-dilated-conv + kernel-flip equivalence in isolation)."""
    import jax.numpy as jnp

    from tvqvae_tpu.models.layers import ConvTranspose2dTorch

    tm = torch.nn.ConvTranspose2d(3, 5, kernel_size=(3, 4), stride=(1, 2),
                                  padding=(1, 1))
    _randomize(tm, seed=3)
    tm.eval()

    x = np.random.default_rng(2).normal(size=(2, 3, 3, 16)).astype(np.float32)
    with torch.no_grad():
        out_ref = tm(torch.from_numpy(x)).numpy()

    m = ConvTranspose2dTorch(5, (3, 4), (1, 2), (1, 1))
    out = m.apply(
        {"params": _convT_params(tm)},
        jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)),
    )
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    assert out.shape == out_ref.shape
    np.testing.assert_allclose(out, out_ref, rtol=1e-4, atol=1e-5)
