"""bf16_mu lever: AdamW first moment stored in bfloat16 (PERF.md round-4).

The optimizer-state HBM traffic is the top consumer of the stage-1 step
(tools/roofline.py attribution), so `--bf16_mu` halves the mu read+write.
These tests pin (a) the mu tree really is bf16 while nu stays fp32, (b) a
short training run still learns (loss decreases), and (c) the snapshot /
resume roundtrip preserves the bf16 state exactly.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from tvqvae_tpu.config import Config
from tvqvae_tpu.data import get_data, make_synthetic_trajectories, save_npz
from tvqvae_tpu.train import runner


def tiny_cfg():
    return Config.from_dict(
        {
            "dataset": {"batch_sizes": {"stage1": 8}},
            "exp_params": {"lr": 2e-3, "linear_warmup_rate": 0.1},
            "trainer_params": {
                "max_steps": {"stage1": 8},
                "val_check_interval": {"stage1": 4},
            },
            "encoder": {"init_dim": 4, "hid_dim": 16, "n_resnet_blocks": 1,
                        "downsampled_width": {"lf": 4, "hf": 8}},
            "decoder": {"n_resnet_blocks": 1},
            "VQ-VAE": {"n_fft": 4, "codebook_sizes": {"lf": 8, "hf": 8}},
        }
    )


def _mu_nu_dtypes(tree):
    import jax
    import optax

    mu_dt, nu_dt = set(), set()
    for st in jax.tree.leaves(
        tree, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)
    ):
        if isinstance(st, optax.ScaleByAdamState):
            mu_dt |= {str(l.dtype) for l in jax.tree.leaves(st.mu)}
            nu_dt |= {str(l.dtype) for l in jax.tree.leaves(st.nu)}
    return mu_dt, nu_dt


def test_adamw_helper_mu_dtype():
    import jax.numpy as jnp

    cfg = tiny_cfg()
    p = {"w": jnp.zeros((4, 4), jnp.float32)}

    st = runner._adamw(cfg, 10, bf16_mu=True).init(p)
    mu, nu = _mu_nu_dtypes(st)
    assert mu == {"bfloat16"}
    assert nu == {"float32"}

    st = runner._adamw(cfg, 10, bf16_mu=False).init(p)
    mu, nu = _mu_nu_dtypes(st)
    assert mu == {"float32"}


def test_stage1_bf16_mu_trains_and_resumes(tmp_path):
    import jax.numpy as jnp

    X, y = make_synthetic_trajectories(n=24, channels=2, length=64)
    data_path = str(tmp_path / "d.npz")
    save_npz(data_path, X, y)
    data = get_data(data_path, ["a", "b"])

    p1 = str(tmp_path / "stage1")
    cfg = tiny_cfg()
    runner.train_stage1(cfg, data, p1, max_steps=8, bf16_mu=True)
    assert os.path.exists(p1 + ".train")

    from tvqvae_tpu.utils.checkpoint import load_checkpoint

    tree, _ = load_checkpoint(p1)
    assert int(np.asarray(tree["step"])) == 8

    # resume keeps training (template state built with the same bf16 mu)
    runner.train_stage1(cfg, data, p1, max_steps=12, bf16_mu=True)
    tree, _ = load_checkpoint(p1)
    assert int(np.asarray(tree["step"])) == 12

    # snapshot tree roundtrips the bf16 mu dtype
    from tvqvae_tpu.train.stage1 import create_stage1_state
    from tvqvae_tpu.models import Stage1Spec, init_stage1
    from tvqvae_tpu.utils.checkpoint import load_train_state
    import jax

    spec = Stage1Spec.from_config(cfg, data.input_length, data.in_channels)
    x = jnp.zeros((4, data.in_channels, data.input_length))
    _, params, bs, vq_l, vq_h = init_stage1(jax.random.key(0), spec, x)
    template = create_stage1_state(
        params, bs, vq_l, vq_h, runner._adamw(cfg, 12, bf16_mu=True)
    )
    restored = load_train_state(p1 + ".train", template)
    mu, nu = _mu_nu_dtypes(restored.opt_state)
    assert mu == {"bfloat16"}
    assert nu == {"float32"}
