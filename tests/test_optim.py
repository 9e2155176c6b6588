"""train.optim.adamw — moment-STORAGE dtype lever (bf16 mu/nu).

Pins (a) the default path (both dtypes None) is bitwise-identical to
optax.adamw — the reference-parity optimizer (reference trains with
torch.optim.AdamW, timevqvae/trainers/stage1.py:229-236) — including when
the custom scale_by_adam_storage transform is used directly; (b) bf16
storage keeps the update arithmetic in fp32 (params drift only at bf16
rounding scale); (c) runner._adamw(bf16_nu=True) produces a bf16 nu tree
with the expected state pytree (checkpoint-isomorphic to the fp32 one).
"""

import numpy as np
import pytest


def _trees(seed=0):
    import jax.numpy as jnp

    r = np.random.default_rng(seed)
    p = {"w": jnp.asarray(r.normal(size=(16, 16)), jnp.float32),
         "b": jnp.asarray(r.normal(size=(16,)), jnp.float32)}
    gs = [{"w": jnp.asarray(r.normal(size=(16, 16)), jnp.float32),
           "b": jnp.asarray(r.normal(size=(16,)), jnp.float32)}
          for _ in range(6)]
    return p, gs


def test_storage_transform_fp32_matches_optax_bitwise():
    import optax

    from tvqvae_tpu.train import optim

    p, gs = _trees()
    tx_ref = optax.adamw(1e-3, weight_decay=0.01)
    tx_new = optax.chain(
        optim.scale_by_adam_storage(),
        optax.add_decayed_weights(0.01),
        optax.scale_by_learning_rate(1e-3),
    )
    sa, sb = tx_ref.init(p), tx_new.init(p)
    pa, pb = dict(p), dict(p)
    for g in gs:
        ua, sa = tx_ref.update(g, sa, pa)
        ub, sb = tx_new.update(g, sb, pb)
        pa = optax.apply_updates(pa, ua)
        pb = optax.apply_updates(pb, ub)
    for k in pa:
        assert np.array_equal(np.asarray(pa[k]), np.asarray(pb[k])), k


def test_adamw_none_delegates_to_optax():
    import optax

    from tvqvae_tpu.train import optim

    p, gs = _trees(1)
    tx_ref = optax.adamw(2e-3, weight_decay=0.01)
    tx_new = optim.adamw(2e-3, weight_decay=0.01)
    sa, sb = tx_ref.init(p), tx_new.init(p)
    pa, pb = dict(p), dict(p)
    for g in gs:
        ua, sa = tx_ref.update(g, sa, pa)
        ub, sb = tx_new.update(g, sb, pb)
        pa = optax.apply_updates(pa, ua)
        pb = optax.apply_updates(pb, ub)
    for k in pa:
        assert np.array_equal(np.asarray(pa[k]), np.asarray(pb[k])), k


def test_bf16_nu_dtype_and_drift():
    import jax
    import jax.numpy as jnp
    import optax

    from tvqvae_tpu.train import optim

    p, gs = _trees(2)
    tx_ref = optax.adamw(1e-3, weight_decay=0.01)
    tx_new = optim.adamw(1e-3, weight_decay=0.01,
                         mu_dtype=jnp.bfloat16, nu_dtype=jnp.bfloat16)
    sa, sb = tx_ref.init(p), tx_new.init(p)

    st = next(s for s in jax.tree.leaves(
        sb, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)
    ) if isinstance(s, optax.ScaleByAdamState))
    assert all(l.dtype == jnp.bfloat16 for l in jax.tree.leaves(st.mu))
    assert all(l.dtype == jnp.bfloat16 for l in jax.tree.leaves(st.nu))

    pa, pb = dict(p), dict(p)
    for g in gs:
        ua, sa = tx_ref.update(g, sa, pa)
        ub, sb = tx_new.update(g, sb, pb)
        pa = optax.apply_updates(pa, ua)
        pb = optax.apply_updates(pb, ub)
    # storage-precision-only change: params stay within bf16 rounding of
    # the fp32-state trajectory over several steps
    for k in pa:
        np.testing.assert_allclose(
            np.asarray(pa[k]), np.asarray(pb[k]), atol=5e-4, rtol=0
        )
        # and the two trajectories genuinely differ (the cast is real)
    assert any(
        not np.array_equal(np.asarray(pa[k]), np.asarray(pb[k])) for k in pa
    )


def test_runner_adamw_bf16_nu_state_tree():
    import jax
    import jax.numpy as jnp
    import optax

    from tvqvae_tpu.config import Config
    from tvqvae_tpu.train import runner

    cfg = Config.from_dict(
        {"exp_params": {"lr": 1e-3, "linear_warmup_rate": 0.1}}
    )
    p = {"w": jnp.zeros((4, 4), jnp.float32)}

    def dtypes(tree):
        mu_dt, nu_dt = set(), set()
        for st in jax.tree.leaves(
            tree, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)
        ):
            if isinstance(st, optax.ScaleByAdamState):
                mu_dt |= {str(l.dtype) for l in jax.tree.leaves(st.mu)}
                nu_dt |= {str(l.dtype) for l in jax.tree.leaves(st.nu)}
        return mu_dt, nu_dt

    st_nu = runner._adamw(cfg, 10, bf16_nu=True).init(p)
    mu, nu = dtypes(st_nu)
    assert mu == {"float32"} and nu == {"bfloat16"}

    st_both = runner._adamw(cfg, 10, bf16_mu=True, bf16_nu=True).init(p)
    mu, nu = dtypes(st_both)
    assert mu == {"bfloat16"} and nu == {"bfloat16"}

    # checkpoint-isomorphic state pytrees across the flag (same treedef)
    st_ref = runner._adamw(cfg, 10).init(p)
    assert (jax.tree.structure(st_ref, is_leaf=lambda x: hasattr(x, "dtype"))
            == jax.tree.structure(st_nu,
                                  is_leaf=lambda x: hasattr(x, "dtype")))


@pytest.mark.slow
def test_stage1_bf16_nu_trains(tmp_path):
    import os

    from tvqvae_tpu.config import Config
    from tvqvae_tpu.data import get_data, make_synthetic_trajectories, save_npz
    from tvqvae_tpu.train import runner
    from tvqvae_tpu.utils.checkpoint import load_checkpoint

    X, y = make_synthetic_trajectories(n=24, channels=2, length=64)
    data_path = str(tmp_path / "d.npz")
    save_npz(data_path, X, y)
    data = get_data(data_path, ["a", "b"])

    cfg = Config.from_dict(
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
    p1 = str(tmp_path / "stage1")
    runner.train_stage1(cfg, data, p1, max_steps=8,
                        bf16_mu=True, bf16_nu=True)
    assert os.path.exists(p1 + ".train")
    tree, _ = load_checkpoint(p1)
    assert int(np.asarray(tree["step"])) == 8
