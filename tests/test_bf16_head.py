"""bf16_head lever (TimeHead (L, L) matmul in the compute dtype): numerics
stay close to the fp32 head, params stay fp32, and a training step runs.

Round-5 per-fusion roofline finding: at L=4633 the two TimeHead weights are
the model's largest parameters and their fp32 forward/backward matmuls sit
in the top traffic entries (PERF.md round-5). The lever only changes the
MATMUL compute dtype — interp, residual add, losses, and parameter/optimizer
storage remain fp32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tvqvae_tpu.config import Config
from tvqvae_tpu.models import Stage1Spec, init_stage1
from tvqvae_tpu.train import make_stage1_train_step
from tvqvae_tpu.train.stage1 import create_stage1_state
import pytest

# heavy big-compile/mesh tests: slow tier (round-5 fast-tier
# budget, VERDICT r4 next-6 — `make test` still runs them)
pytestmark = pytest.mark.slow


B, C, L = 2, 4, 256


def _setup(bf16_head):
    cfg = Config()
    spec = Stage1Spec.from_config(
        cfg, L, C, compute_dtype="bfloat16", fast_bn=True,
        bf16_head=bf16_head,
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, C, L)), jnp.float32
    )
    model, params, batch_stats, vq_l, vq_h = init_stage1(
        jax.random.key(0), spec, x
    )
    return spec, model, params, batch_stats, vq_l, vq_h, x


def test_bf16_head_close_to_fp32_head():
    outs = {}
    for flag in (False, True):
        spec, model, params, bs, vq_l, vq_h, x = _setup(flag)
        out = model.apply(
            {"params": params, "batch_stats": bs}, x, vq_l, vq_h, False
        )
        outs[flag] = np.asarray(out.xhat_l)
        # head params are fp32 regardless of the compute dtype
        head = params["head_l"]["Dense_0"]["kernel"]
        assert head.dtype == jnp.float32
        assert head.shape == (L, L)
    # same init (same seed) -> identical weights; bf16 matmul rounding only
    np.testing.assert_allclose(outs[True], outs[False], rtol=2e-2, atol=5e-2)
    assert not np.array_equal(outs[True], outs[False])  # lever engaged


def test_bf16_head_train_step_runs():
    spec, model, params, bs, vq_l, vq_h, x = _setup(True)
    tx = optax.adamw(1e-3)
    state = create_stage1_state(params, bs, vq_l, vq_h, tx)
    step = jax.jit(make_stage1_train_step(model, tx))
    state2, metrics = step(state, x, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    w0 = state.params["head_l"]["Dense_0"]["kernel"]
    w1 = state2.params["head_l"]["Dense_0"]["kernel"]
    assert w1.dtype == jnp.float32
    assert not np.array_equal(np.asarray(w0), np.asarray(w1))


def test_bf16_istft_decode_close_to_fp32_istft():
    """bf16_istft (decode-side overlap-add in the compute dtype): same
    params, decode() output stays close to the fp32-iSTFT decode."""
    import dataclasses

    spec, model, params, bs, vq_l, vq_h, x = _setup(True)
    from tvqvae_tpu.models.stage1 import Stage1Model
    from tvqvae_tpu.models.vq import vq_forward

    z = model.apply({"params": params, "batch_stats": bs}, x, "lf",
                    method=Stage1Model.encode)
    s_tok = vq_forward(vq_l, z, spec.vq_l, train=False).indices
    zq = jnp.take(vq_l.embed, s_tok, axis=0)

    outs = {}
    for flag in (False, True):
        sp = dataclasses.replace(spec, bf16_istft=flag)
        m2 = Stage1Model(sp)
        outs[flag] = np.asarray(m2.apply(
            {"params": params, "batch_stats": bs}, zq, "lf",
            method=Stage1Model.decode,
        ))
    assert outs[True].dtype == np.float32
    np.testing.assert_allclose(outs[True], outs[False], rtol=5e-2, atol=5e-2)
    assert not np.array_equal(outs[True], outs[False])  # lever engaged
