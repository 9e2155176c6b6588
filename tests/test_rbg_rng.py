"""rbg training-rng lever (`train --rbg_rng` / runner rng_impl="rbg"):
the stage-1 step accepts a counter-based (rbg) key for its dropout rngs and
trains identically in structure — only the drawn masks differ.

Measured cost difference: tools/dropout_probe.py (threefry vs rbg vs off).
"""

import numpy as np
import pytest

# heavy big-compile/mesh tests: slow tier (round-5 fast-tier
# budget, VERDICT r4 next-6 — `make test` still runs them)
pytestmark = pytest.mark.slow



def _tiny_setup(rng_impl=None):
    import jax
    import jax.numpy as jnp
    import optax

    from tvqvae_tpu.config import Config
    from tvqvae_tpu.models.stage1 import Stage1Spec, init_stage1
    from tvqvae_tpu.train.stage1 import (
        create_stage1_state,
        make_stage1_train_step,
    )

    cfg = Config.from_dict({
        "encoder": {"init_dim": 4, "hid_dim": 8, "n_resnet_blocks": 1,
                    "downsampled_width": {"lf": 4, "hf": 8}},
        "decoder": {"n_resnet_blocks": 1},
        "VQ-VAE": {"n_fft": 4, "codebook_sizes": {"lf": 8, "hf": 8}},
    })
    spec = Stage1Spec.from_config(cfg, 64, 2)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 2, 64)), jnp.float32
    )
    model, params, stats, vq_l, vq_h = init_stage1(jax.random.key(0), spec, x)
    tx = optax.adam(1e-3)
    state = create_stage1_state(params, stats, vq_l, vq_h, tx)
    step = jax.jit(make_stage1_train_step(model, tx))
    rng = (jax.random.key(1) if rng_impl is None
           else jax.random.key(1, impl=rng_impl))
    return step, state, x, rng


def test_stage1_step_trains_under_rbg_keys():
    step, state, x, rng = _tiny_setup("rbg")
    for _ in range(3):
        state, metrics = step(state, x, rng)
    assert int(state.step) == 3
    assert np.isfinite(float(metrics["loss"]))


def test_rbg_and_threefry_agree_up_to_dropout_masks():
    # identical params/data; only the dropout draws differ -> losses are
    # close but not (necessarily) identical, and both finite
    step_t, state_t, x, rng_t = _tiny_setup(None)
    step_r, state_r, _, rng_r = _tiny_setup("rbg")
    _, m_t = step_t(state_t, x, rng_t)
    _, m_r = step_r(state_r, x, rng_r)
    lt, lr = float(m_t["loss"]), float(m_r["loss"])
    assert np.isfinite(lt) and np.isfinite(lr)
    assert abs(lt - lr) / max(abs(lt), 1e-6) < 0.5
