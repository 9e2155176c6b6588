"""Checkpoint import bridge: reference torch state_dicts -> framework
checkpoints, verified by output parity against the reference's own modules.

Complements the weight-transplant tests (which prove the tensor layout
mapping): here the SAME parity bar is hit going through the real artifact
path — torch.save'd reference checkpoints -> import_ckpt CLI -> Orbax
checkpoint -> this repo's loaders.
"""

import os
import sys

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
sys.path.insert(0, os.path.abspath(TOOLS))

torch = pytest.importorskip("torch")

import refshim  # noqa: E402

# heavy big-compile/mesh tests: slow tier (round-5 fast-tier
# budget, VERDICT r4 next-6 — `make test` still runs them)
pytestmark = pytest.mark.slow


if not refshim.reference_available():
    pytest.skip("/root/reference not present", allow_module_level=True)


@pytest.fixture(scope="module", autouse=True)
def _reference_stubs():
    installed = refshim.install()
    yield
    refshim.uninstall(installed)


def _randomize(module, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.empty_like(p).uniform_(-0.4, 0.4, generator=g))
        for m in module.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.copy_(torch.empty_like(m.running_mean)
                                     .uniform_(-0.3, 0.3, generator=g))
                m.running_var.copy_(torch.empty_like(m.running_var)
                                    .uniform_(0.5, 1.5, generator=g))
            if m.__class__.__name__ == "SnakeActivation" and hasattr(m, "a"):
                m.a.abs_().clamp_(min=0.2)


# --- FCN -------------------------------------------------------------------


def test_fcn_import_cli_roundtrip(tmp_path):
    import jax.numpy as jnp
    from timevqvae.models.fcn import FCNBaseline

    from tvqvae_tpu.models.fcn import FCN
    from tvqvae_tpu.scripts.import_ckpt import main as import_main
    from tvqvae_tpu.train.runner import load_fcn_bundle

    C, NCLS, B, L = 4, 5, 3, 97
    ref = FCNBaseline(in_channels=C, num_pred_classes=NCLS)
    _randomize(ref, seed=7)
    ref.eval()
    ckpt = str(tmp_path / "fcn.ckpt")
    torch.save(ref.state_dict(), ckpt)  # reference train_fcn.py:253-256

    out_dir = str(tmp_path / "models")
    import_main(["--fcn_ckpt", ckpt, "--out_dir", out_dir])

    variables, meta = load_fcn_bundle(os.path.join(out_dir, "fcn"))
    assert meta["n_classes"] == NCLS and meta["in_channels"] == C

    x = np.random.default_rng(0).normal(size=(B, C, L)).astype(np.float32)
    with torch.no_grad():
        logits_ref = ref(torch.from_numpy(x)).numpy()
        feats_ref = ref(torch.from_numpy(x), return_feature_vector=True).numpy()
    fcn = FCN(n_classes=NCLS)
    logits = np.asarray(fcn.apply(variables, jnp.asarray(x), False))
    feats = np.asarray(fcn.apply(variables, jnp.asarray(x), False, True))
    np.testing.assert_allclose(feats, feats_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(logits, logits_ref, rtol=2e-4, atol=2e-4)


# --- stage 1 ----------------------------------------------------------------

B, C, L, NFFT = 2, 2, 128, 4
INIT_DIM, HID_DIM, N_RES = 4, 8, 1
WIDTH_L, WIDTH_H = 8, 32  # -> halvings 4 / 2 at L=128
K_L, K_H = 8, 8

TINY_CFG = {
    "encoder": {"init_dim": INIT_DIM, "hid_dim": HID_DIM,
                "n_resnet_blocks": N_RES,
                "downsampled_width": {"lf": WIDTH_L, "hf": WIDTH_H}},
    "decoder": {"n_resnet_blocks": N_RES},
    "VQ-VAE": {"n_fft": NFFT, "codebook_sizes": {"lf": K_L, "hf": K_H}},
}


def _ref_stage1_state_dict():
    """Assemble a reference-style Lightning stage1.ckpt from the reference's
    own randomized modules (trainers/stage1.py attribute names)."""
    from timevqvae.models.vq import VectorQuantize
    from timevqvae.models.vq_vae import VQVAEDecoder, VQVAEEncoder
    from timevqvae.utils import zero_pad_high_freq, zero_pad_low_freq

    from tvqvae_tpu.ops import token_geometry

    mods = {}
    for band, width, K, pad in (
        ("l", WIDTH_L, K_L, zero_pad_high_freq),
        ("h", WIDTH_H, K_H, zero_pad_low_freq),
    ):
        g = token_geometry(L, NFFT, width)
        rate = 2 ** g.num_halvings
        enc = VQVAEEncoder(INIT_DIM, HID_DIM, 2 * C, rate, N_RES, pad, NFFT,
                           frequency_indepence=False)
        dec = VQVAEDecoder(INIT_DIM, HID_DIM, 2 * C, rate, N_RES, L, pad,
                           NFFT, C, frequency_indepence=False)
        vq = VectorQuantize(HID_DIM, K, n_fft=NFFT,
                            codebook_sizes={"lf": K_L, "hf": K_H})
        _randomize(enc, seed=ord(band))
        _randomize(dec, seed=ord(band) + 50)
        with torch.no_grad():
            g2 = torch.Generator().manual_seed(ord(band) + 99)
            vq._codebook.embed.copy_(
                torch.empty_like(vq._codebook.embed).uniform_(
                    -0.5, 0.5, generator=g2))
            vq._codebook.embed_avg.copy_(vq._codebook.embed * 1.5)
            vq._codebook.cluster_size.copy_(
                torch.empty_like(vq._codebook.cluster_size).uniform_(
                    0.5, 2.0, generator=g2))
            vq._codebook.initted.fill_(1.0)
        enc.eval(), dec.eval(), vq.eval()
        mods[band] = (enc, dec, vq)

    sd = {}
    for band, (enc, dec, vq) in mods.items():
        for prefix, m in ((f"encoder_{band}", enc), (f"decoder_{band}", dec),
                          (f"vq_model_{band}", vq)):
            for k, v in m.state_dict().items():
                sd[f"{prefix}.{k}"] = v
    return mods, {"state_dict": sd, "hyper_parameters": {}}


def test_stage1_import_cli_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    import yaml

    from tvqvae_tpu.config import Config
    from tvqvae_tpu.models.vq import vq_forward
    from tvqvae_tpu.ops import time_to_timefreq, zero_pad_high_freq
    from tvqvae_tpu.scripts.import_ckpt import main as import_main
    from tvqvae_tpu.train.runner import load_stage1_bundle

    mods, ckpt_obj = _ref_stage1_state_dict()
    ckpt = str(tmp_path / "stage1.ckpt")
    torch.save(ckpt_obj, ckpt)
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(TINY_CFG, f)

    out_dir = str(tmp_path / "models")
    import_main(["--stage1_ckpt", ckpt, "--out_dir", out_dir,
                 "--config", cfg_path, "--n_classes", "3"])

    cfg = Config.from_yaml(cfg_path)
    model, frozen, spec, meta = load_stage1_bundle(
        cfg, os.path.join(out_dir, "stage1")
    )
    assert meta["input_length"] == L and meta["n_classes"] == 3

    x = np.random.default_rng(3).normal(size=(B, C, L)).astype(np.float32)

    # encoder parity (lf band) through the imported checkpoint
    enc_ref, dec_ref, vq_ref = mods["l"]
    with torch.no_grad():
        z_ref = enc_ref(torch.from_numpy(x)).numpy()  # (B, hid, H', W')
    z = model.apply(
        {"params": frozen.params, "batch_stats": frozen.batch_stats},
        x, "lf", False, method="encode",
    )  # (B, N, D)
    H, W = spec.hw_l
    z_grid = np.transpose(
        np.asarray(z).reshape(B, H, W, HID_DIM), (0, 3, 1, 2)
    )
    np.testing.assert_allclose(z_grid, z_ref, rtol=2e-4, atol=2e-4)

    # codebook parity + full roundtrip finiteness
    np.testing.assert_allclose(
        np.asarray(frozen.vq_l.embed),
        vq_ref._codebook.embed.detach().numpy(), atol=1e-6,
    )
    out = vq_forward(frozen.vq_l, z, spec.vq_l, train=False)
    xhat = model.apply(
        {"params": frozen.params, "batch_stats": frozen.batch_stats},
        out.quantized, "lf", False, method="decode",
    )
    assert np.asarray(xhat).shape == (B, C, L)
    assert np.isfinite(np.asarray(xhat)).all()

    # decoder parity (lf): same quantized grid through the reference decoder
    zq_grid = np.transpose(
        np.asarray(out.quantized).reshape(B, H, W, HID_DIM), (0, 3, 1, 2)
    )
    with torch.no_grad():
        xhat_ref = dec_ref(torch.from_numpy(zq_grid)).numpy()
    np.testing.assert_allclose(
        np.asarray(xhat), xhat_ref, rtol=5e-4, atol=5e-4
    )


# --- stage 3 (fidelity enhancer) ---------------------------------------------


def _ref_stage3_state_dict():
    """Reference-style Lightning stage3.ckpt: fidelity_enhancer.* keys (the
    prefix sampler.py:100-106 strips) + frozen-stage junk that the importer
    must ignore."""
    from timevqvae.models.fidelity_enhancer import FidelityEnhancer

    fe = FidelityEnhancer(
        input_length=L, in_channels=C,
        config={"fidelity_enhancer": {
            "dim": 8, "dim_mults": [1, 2, 4, 8],
            "resnet_block_groups": 4, "dropout": 0.0,
        }},
    )
    _randomize(fe, seed=23)
    with torch.no_grad():
        fe.tau.fill_(0.35)
    fe.eval()
    sd = {f"fidelity_enhancer.{k}": v for k, v in fe.state_dict().items()}
    sd["maskgit.transformer_l.junk"] = torch.zeros(3)
    return fe, {"state_dict": sd, "hyper_parameters": {}}


def test_stage3_import_cli_roundtrip(tmp_path):
    import jax.numpy as jnp
    import yaml

    from tvqvae_tpu.config import Config
    from tvqvae_tpu.models.fidelity_enhancer import FidelityEnhancer
    from tvqvae_tpu.scripts.import_ckpt import main as import_main
    from tvqvae_tpu.utils.checkpoint import load_checkpoint

    _, s1_obj = _ref_stage1_state_dict()
    ref_fe, s3_obj = _ref_stage3_state_dict()
    s1 = str(tmp_path / "stage1.ckpt")
    s3 = str(tmp_path / "stage3.ckpt")
    torch.save(s1_obj, s1)
    torch.save(s3_obj, s3)
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump({**TINY_CFG, "fidelity_enhancer": {
            "dim": 8, "dim_mults": [1, 2, 4, 8],
            "resnet_block_groups": 4, "dropout": 0.0,
        }}, f)

    out_dir = str(tmp_path / "models")
    import_main(["--stage1_ckpt", s1, "--stage3_ckpt", s3,
                 "--out_dir", out_dir, "--config", cfg_path,
                 "--n_classes", "3"])

    tree3, meta3 = load_checkpoint(os.path.join(out_dir, "stage3"))
    assert abs(float(np.asarray(tree3["tau"])) - 0.35) < 1e-6
    assert meta3["input_length"] == L and meta3["in_channels"] == C

    cfg = Config.from_yaml(cfg_path)
    fe = FidelityEnhancer(
        input_length=L, in_channels=C,
        dim=cfg.fidelity_enhancer.dim,
        dim_mults=tuple(cfg.fidelity_enhancer.dim_mults),
        resnet_block_groups=cfg.fidelity_enhancer.resnet_block_groups,
        dropout=cfg.fidelity_enhancer.dropout,
    )  # exactly the sampler's stage-3 reconstruction (sampler.py:75-83)
    x = np.random.default_rng(11).normal(size=(B, C, 96)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref_fe(torch.from_numpy(x)).numpy()
    out = np.asarray(
        fe.apply({"params": tree3["params"]}, jnp.asarray(x), False)
    )
    np.testing.assert_allclose(out, out_ref, rtol=5e-4, atol=5e-4)


def test_stage3_import_requires_stage1(tmp_path):
    from tvqvae_tpu.scripts.import_ckpt import main as import_main

    _, s3_obj = _ref_stage3_state_dict()
    s3 = str(tmp_path / "stage3.ckpt")
    torch.save(s3_obj, s3)
    with pytest.raises(SystemExit):
        import_main(["--stage3_ckpt", s3, "--out_dir", str(tmp_path / "m")])


def test_import_rejects_mismatched_config(tmp_path):
    import yaml

    from tvqvae_tpu.scripts.import_ckpt import main as import_main

    _, ckpt_obj = _ref_stage1_state_dict()
    ckpt = str(tmp_path / "stage1.ckpt")
    torch.save(ckpt_obj, ckpt)
    bad = {**TINY_CFG, "encoder": {**TINY_CFG["encoder"],
                                   "n_resnet_blocks": 2}}
    cfg_path = str(tmp_path / "bad.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(bad, f)
    with pytest.raises(SystemExit, match="stage1"):
        import_main(["--stage1_ckpt", ckpt, "--out_dir",
                     str(tmp_path / "m"), "--config", cfg_path,
                     "--n_classes", "3"])
