"""Stage-1 (VQ-VAE) training step and state.

Replaces the reference Lightning module loop (timevqvae/trainers/stage1.py)
with a single jitted SPMD step: forward (STFT conv -> encoders -> VQ ->
decoders), loss (MSE LF + L1 HF + commitment, stage1.py:170-177), AdamW with
warmup-cosine (stage1.py:229-236), plus the functional side-state advances
(BatchNorm running stats, VQ codebook EMA). Batches are sharded over the
`data` mesh axis; parameters/codebooks replicated.
"""

from typing import Any, Callable, Dict, Tuple

import jax
import optax
from flax import struct

from tvqvae_tpu.models.stage1 import Stage1Model, stage1_losses
from tvqvae_tpu.models.vq import CodebookState


@struct.dataclass
class Stage1TrainState:
    params: Any
    batch_stats: Any
    vq_l: CodebookState
    vq_h: CodebookState
    opt_state: Any
    step: jax.Array


def create_stage1_state(
    params, batch_stats, vq_l, vq_h, tx: optax.GradientTransformation
) -> Stage1TrainState:
    import jax.numpy as jnp

    return Stage1TrainState(
        params=params,
        batch_stats=batch_stats,
        vq_l=vq_l,
        vq_h=vq_h,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_stage1_train_step(
    model: Stage1Model, tx: optax.GradientTransformation
) -> Callable:
    """Returns jit-able step(state, x, rng) -> (state, metrics)."""

    def step(
        state: Stage1TrainState, x: jax.Array, rng: jax.Array
    ) -> Tuple[Stage1TrainState, Dict[str, jax.Array]]:
        drng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, state.vq_l, state.vq_h, True,
                rngs={"dropout": drng},
                mutable=["batch_stats"],
            )
            total, metrics = stage1_losses(out)
            return total, (out, mut, metrics)

        grads, (out, mut, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = Stage1TrainState(
            params=params,
            batch_stats=mut["batch_stats"],
            vq_l=out.vq_l.state,
            vq_h=out.vq_h.state,
            opt_state=opt_state,
            step=state.step + 1,
        )
        return new_state, metrics

    return step


def make_stage1_train_multistep(
    model: Stage1Model, tx: optax.GradientTransformation, n_steps: int
) -> Callable:
    """One jitted program advancing `n_steps` training steps via lax.scan
    over a stacked batch bundle xs (n_steps, B, C, L): one host dispatch per
    n_steps batches, which hides host/tunnel round-trip latency (bundled
    stepping — the idiomatic TPU training-loop shape). Per-step semantics
    are IDENTICAL to make_stage1_train_step (dropout keys fold in
    state.step, which the scan advances); metrics are bundle means.
    Equivalence is pinned by tests/test_multistep.py."""
    import jax.numpy as jnp

    step = make_stage1_train_step(model, tx)

    def multistep(
        state: Stage1TrainState, xs: jax.Array, rng: jax.Array
    ) -> Tuple[Stage1TrainState, Dict[str, jax.Array]]:
        def body(st, x):
            return step(st, x, rng)

        state, ms = jax.lax.scan(body, state, xs)
        return state, jax.tree.map(lambda a: jnp.mean(a, axis=0), ms)

    return multistep


def make_stage1_eval_step(model: Stage1Model, per_sample: bool = False) -> Callable:
    """Eval step. Default: batch-mean metrics (reference val loss semantics —
    commit loss is 0 outside training, vq.py:362-366). With per_sample=True,
    returns ({name: (B,) per-sample losses}, {name: batch scalars}, out) so a
    caller can average over the FULL validation split with wrap-padded fixed
    batch shapes and no padding bias (reference validates the whole val
    loader, scripts/train.py:109-113)."""
    import jax.numpy as jnp

    def step(state: Stage1TrainState, x: jax.Array):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, state.vq_l, state.vq_h, False,
        )
        if per_sample:
            per = {
                "recons_loss.LF.time": jnp.mean(
                    (out.x_l - out.xhat_l) ** 2, axis=(1, 2)
                ),
                "recons_loss.HF.time": jnp.mean(
                    jnp.abs(out.x_h - out.xhat_h), axis=(1, 2)
                ),
            }
            scalars = {
                "perplexity.LF": out.vq_l.perplexity,
                "perplexity.HF": out.vq_h.perplexity,
            }
            return per, scalars, out
        total, metrics = stage1_losses(out)
        return metrics, out

    return step
