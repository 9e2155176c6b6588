"""Stage-3 (fidelity enhancer) training step and state.

Reference loop: timevqvae/trainers/stage3.py:197-231 — stochastic-VQ (tau)
round trip through the frozen stage-1 network produces a degraded x', and
the U-Net learns L1(FE(x'), x). tau is a static hyperparameter of the step
(the reference's tau buffer stays 0.0 because search_optimal_tau is never
invoked by any entry point — stage3.py:86-167; we expose the search as an
explicit opt-in, see generation/sampler.py).

An optional MiniRocket perceptual loss (weight 0 in the published config,
configs/config.yaml:86) is applied when percept_loss_weight > 0.
"""

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tvqvae_tpu.models.fidelity_enhancer import FidelityEnhancer
from tvqvae_tpu.models.maskgit import FrozenStage1, decode_tokens, encode_tokens
from tvqvae_tpu.models.stage1 import Stage1Model


@struct.dataclass
class Stage3TrainState:
    params: Any
    opt_state: Any
    step: jax.Array
    tau: jax.Array  # stored for checkpointing; step uses the static value


def init_stage3(
    rng: jax.Array, fe: FidelityEnhancer, example_x: jax.Array
) -> dict:
    r_p, r_d = jax.random.split(rng)
    # jitted: one cacheable init program (see models/stage1.py init_stage1)
    variables = jax.jit(
        lambda rp, rd, x: fe.init({"params": rp, "dropout": rd}, x, False)
    )(r_p, r_d, example_x)
    return variables["params"]


def create_stage3_state(
    params, tx: optax.GradientTransformation, tau: float = 0.0
) -> Stage3TrainState:
    return Stage3TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        tau=jnp.asarray(tau, jnp.float32),
    )


def svq_roundtrip(
    stage1_model: Stage1Model,
    frozen: FrozenStage1,
    x: jax.Array,
    tau: float,
    rng: Optional[jax.Array],
) -> jax.Array:
    """x -> SVQ(tau) tokens -> decoded x' (reference stage3.py:205-210 +
    _fidelity_enhancer_loss_fn :169-184)."""
    if tau and tau > 0.0:
        r1, r2 = jax.random.split(rng)
    else:
        r1 = r2 = None
    s_l = encode_tokens(stage1_model, frozen, x, "lf", svq_temp=tau, rng=r1)
    s_h = encode_tokens(stage1_model, frozen, x, "hf", svq_temp=tau, rng=r2)
    x_l = decode_tokens(stage1_model, frozen, s_l, "lf")
    x_h = decode_tokens(stage1_model, frozen, s_h, "hf")
    return jax.lax.stop_gradient(x_l + x_h)


def _fe_update(
    state: Stage3TrainState,
    x: jax.Array,
    xprime: jax.Array,
    r_drop: jax.Array,
    fe: FidelityEnhancer,
    tx: optax.GradientTransformation,
    percept_loss_weight: float,
    percept_fn: Optional[Callable],
) -> Tuple[Stage3TrainState, Dict[str, jax.Array]]:
    """Shared FE L1(+percept) update given the degraded input x'. Both the
    on-the-fly and precomputed paths route here; the RNG split order in the
    callers is the equivalence contract (tests/test_precompute.py)."""

    def loss_fn(params):
        xhat = fe.apply(
            {"params": params}, xprime, True, rngs={"dropout": r_drop}
        )
        recons = jnp.mean(jnp.abs(xhat - x))
        percept = jnp.float32(0.0)
        if percept_loss_weight > 0.0 and percept_fn is not None:
            za = percept_fn(xhat)
            zb = percept_fn(x)
            percept = percept_loss_weight * jnp.mean((za - zb) ** 2)
        return recons + percept, (recons, percept)

    grads, (recons, percept) = jax.grad(loss_fn, has_aux=True)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = Stage3TrainState(
        params=params, opt_state=opt_state, step=state.step + 1,
        tau=state.tau,
    )
    metrics = {
        "loss": recons + percept,
        "fidelity_enhancer_loss": recons,
        "percept_loss": percept,
    }
    return new_state, metrics


def make_stage3_train_step(
    stage1_model: Stage1Model,
    fe: FidelityEnhancer,
    tx: optax.GradientTransformation,
    tau: float = 0.0,
    percept_loss_weight: float = 0.0,
    percept_fn: Optional[Callable] = None,
) -> Callable:
    """step(state, frozen, x, rng) -> (state, metrics) — on-the-fly path:
    runs the frozen SVQ roundtrip inside the step (needed whenever tau > 0,
    where x' is stochastic per step)."""

    def step(
        state: Stage3TrainState,
        frozen: FrozenStage1,
        x: jax.Array,
        rng: jax.Array,
    ) -> Tuple[Stage3TrainState, Dict[str, jax.Array]]:
        rng = jax.random.fold_in(rng, state.step)
        r_svq, r_drop = jax.random.split(rng)
        xprime = svq_roundtrip(stage1_model, frozen, x, tau, r_svq)
        return _fe_update(
            state, x, xprime, r_drop, fe, tx, percept_loss_weight, percept_fn
        )

    return step


def make_stage3_train_step_pre(
    fe: FidelityEnhancer,
    tx: optax.GradientTransformation,
    percept_loss_weight: float = 0.0,
    percept_fn: Optional[Callable] = None,
) -> Callable:
    """step(state, x, xprime, rng) -> (state, metrics) — PRECOMPUTED-x' path
    (TPU-first redesign of reference stage3.py:205-210, which re-runs the
    frozen SVQ roundtrip every step even though at tau=0 it is argmax VQ +
    eval-mode BN — deterministic per sample). Valid only for tau == 0; the
    runner keeps the on-the-fly step for tau > 0 / --search_tau. Given
    identical x'/rng the update is IDENTICAL to the on-the-fly step (the
    unused r_svq is still split off to preserve r_drop)."""

    def step(
        state: Stage3TrainState,
        x: jax.Array,
        xprime: jax.Array,
        rng: jax.Array,
    ) -> Tuple[Stage3TrainState, Dict[str, jax.Array]]:
        rng = jax.random.fold_in(rng, state.step)
        _r_svq, r_drop = jax.random.split(rng)
        return _fe_update(
            state, x, xprime, r_drop, fe, tx, percept_loss_weight, percept_fn
        )

    return step


def make_xprime_fn(stage1_model: Stage1Model) -> Callable:
    """Jitted deterministic tau=0 roundtrip (frozen, x) -> x'."""

    def f(frozen: FrozenStage1, x: jax.Array) -> jax.Array:
        return svq_roundtrip(stage1_model, frozen, x, 0.0, None)

    return jax.jit(f)


def precompute_xprime_dataset(
    stage1_model: Stage1Model,
    frozen: FrozenStage1,
    X,
    batch_size: int = 32,
    mesh=None,
    keep_on_device: bool = False,
):
    """One tau=0 SVQ-roundtrip sweep over X -> x' float32 array
    (wrap-padded fixed-shape batches, pad rows dropped).

    With keep_on_device the result stays a jax.Array in HBM (never
    round-trips to the host) — pair with a device-resident X so the whole
    precompute is chip-local."""
    import numpy as np

    f = make_xprime_fn(stage1_model)
    if not isinstance(X, jax.Array):
        X = np.asarray(X)
    N = X.shape[0]
    bs = min(batch_size, N)
    if mesh is not None:
        m = mesh.devices.size
        bs = -(-bs // m) * m
    out = []
    for s in range(0, N, bs):
        idx = np.arange(s, s + bs) % N
        xb = X[idx] if isinstance(X, jax.Array) else jnp.asarray(X[idx])
        if mesh is not None:
            from tvqvae_tpu.parallel.mesh import shard_batch

            xb = shard_batch(mesh, xb)
        xp = f(frozen, xb)
        real = min(bs, N - s)
        if keep_on_device:
            out.append(xp[:real].astype(jnp.float32))
        else:
            out.append(np.asarray(xp[:real], dtype=np.float32))
    return jnp.concatenate(out) if keep_on_device else np.concatenate(out)
