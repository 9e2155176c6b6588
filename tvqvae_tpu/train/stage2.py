"""Stage-2 (MaskGIT prior) training step and state.

Reference loop: timevqvae/trainers/stage2.py:49-68 — frozen stage-1 encode
of both bands, random masking, two transformer CE losses. Here the frozen
stage-1 bundle is an explicit argument (replicated on the mesh) and the
whole step jit-compiles; batches shard over `data`.
"""

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tvqvae_tpu.models.maskgit import (
    FrozenStage1,
    MaskGITSpec,
    encode_tokens,
    masked_ce,
    random_mask_tokens,
)
from tvqvae_tpu.models.stage1 import Stage1Model
from tvqvae_tpu.models.transformer import BidirectionalTransformer


@struct.dataclass
class Stage2TrainState:
    params: Any  # {"l": tree, "h": tree}
    h_stats: Any  # transformer_h batch_stats (Upscale BN)
    opt_state: Any
    step: jax.Array


def init_stage2(
    rng: jax.Array,
    t_l: BidirectionalTransformer,
    t_h: BidirectionalTransformer,
    spec: MaskGITSpec,
    batch: int = 2,
) -> Tuple[dict, dict]:
    """Initialize both prior transformers; returns (params, h_stats)."""
    r_l, r_h, r_d = jax.random.split(rng, 3)
    s_l = jnp.zeros((batch, spec.tokens_l), jnp.int32)
    s_h = jnp.zeros((batch, spec.tokens_h), jnp.int32)
    y = jnp.zeros((batch, 1), jnp.int32)
    # jitted: one cacheable init program per transformer instead of
    # per-op eager dispatch (see models/stage1.py init_stage1)
    v_l = jax.jit(
        lambda r, rd, a, c: t_l.init(
            {"params": r, "dropout": rd}, a, None, c, False)
    )(r_l, r_d, s_l, y)
    v_h = jax.jit(
        lambda r, rd, a, b, c: t_h.init(
            {"params": r, "dropout": rd}, a, b, c, False)
    )(r_h, r_d, s_l, s_h, y)
    params = {"l": v_l["params"], "h": v_h["params"]}
    h_stats = v_h.get("batch_stats", {})
    return params, h_stats


def create_stage2_state(
    params, h_stats, tx: optax.GradientTransformation
) -> Stage2TrainState:
    return Stage2TrainState(
        params=params,
        h_stats=h_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def _tokens_update(
    state: Stage2TrainState,
    s_l: jax.Array,
    s_h: jax.Array,
    y: Optional[jax.Array],
    rng: jax.Array,
    t_l: BidirectionalTransformer,
    t_h: BidirectionalTransformer,
    spec: MaskGITSpec,
    tx: optax.GradientTransformation,
) -> Tuple[Stage2TrainState, Dict[str, jax.Array]]:
    """Shared mask+CE+update body given token grids. `rng` is the already
    step-folded key; the 4-way split order is the contract both the
    on-the-fly and precomputed-token steps rely on for exact equivalence
    (pinned by tests/test_precompute.py)."""
    r_mask_l, r_mask_h, r_drop_l, r_drop_h = jax.random.split(rng, 4)

    s_l_M, keep_l = random_mask_tokens(r_mask_l, s_l, spec.mask_token_l)
    s_h_M, keep_h = random_mask_tokens(r_mask_h, s_h, spec.mask_token_h)

    def loss_fn(params):
        logits_l = t_l.apply(
            {"params": params["l"]}, s_l_M, None, y, True,
            rngs={"dropout": r_drop_l},
        )
        logits_h, mut = t_h.apply(
            {"params": params["h"], "batch_stats": state.h_stats},
            s_l_M, s_h_M, y, True,
            rngs={"dropout": r_drop_h},
            mutable=["batch_stats"],
        )
        ce_l = masked_ce(logits_l, s_l, keep_l)
        ce_h = masked_ce(logits_h, s_h, keep_h)
        return ce_l + ce_h, (ce_l, ce_h, mut)

    grads, (ce_l, ce_h, mut) = jax.grad(loss_fn, has_aux=True)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = Stage2TrainState(
        params=params,
        h_stats=mut.get("batch_stats", state.h_stats),
        opt_state=opt_state,
        step=state.step + 1,
    )
    metrics = {
        "loss": ce_l + ce_h,
        "mask_pred_loss": ce_l + ce_h,
        "mask_pred_loss_l": ce_l,
        "mask_pred_loss_h": ce_h,
    }
    return new_state, metrics


def make_stage2_train_step(
    stage1_model: Stage1Model,
    t_l: BidirectionalTransformer,
    t_h: BidirectionalTransformer,
    spec: MaskGITSpec,
    tx: optax.GradientTransformation,
) -> Callable:
    """step(state, frozen, x, y, rng) -> (state, metrics) — on-the-fly path:
    runs the frozen stage-1 encoders inside the step (reference
    trainers/stage2.py:49-68 semantics)."""

    def step(
        state: Stage2TrainState,
        frozen: FrozenStage1,
        x: jax.Array,
        y: Optional[jax.Array],
        rng: jax.Array,
    ) -> Tuple[Stage2TrainState, Dict[str, jax.Array]]:
        rng = jax.random.fold_in(rng, state.step)
        s_l = encode_tokens(stage1_model, frozen, x, "lf")
        s_h = encode_tokens(stage1_model, frozen, x, "hf")
        return _tokens_update(state, s_l, s_h, y, rng, t_l, t_h, spec, tx)

    return step


def make_stage2_train_step_tokens(
    t_l: BidirectionalTransformer,
    t_h: BidirectionalTransformer,
    spec: MaskGITSpec,
    tx: optax.GradientTransformation,
) -> Callable:
    """step(state, s_l, s_h, y, rng) -> (state, metrics) — PRECOMPUTED-token
    path (TPU-first redesign of reference maskgit.py:167-168, which re-runs
    both frozen conv encoders on every one of 200k steps even though the
    encode is fully deterministic per sample: eval-mode BN + argmax VQ).
    One eval sweep (`precompute_token_dataset`) turns the train set into
    (N, tokens_l)/(N, tokens_h) int arrays and the step becomes pure
    transformer compute over the 27/108-token grids. Given identical tokens
    + rng, losses/updates are IDENTICAL to the on-the-fly step (same
    fold_in + split order; tests/test_precompute.py)."""

    def step(
        state: Stage2TrainState,
        s_l: jax.Array,
        s_h: jax.Array,
        y: Optional[jax.Array],
        rng: jax.Array,
    ) -> Tuple[Stage2TrainState, Dict[str, jax.Array]]:
        rng = jax.random.fold_in(rng, state.step)
        return _tokens_update(state, s_l, s_h, y, rng, t_l, t_h, spec, tx)

    return step


def make_token_encode_fn(stage1_model: Stage1Model) -> Callable:
    """Jitted eval-mode encoder (frozen, x) -> (s_l, s_h) — deterministic
    (frozen BN stats, argmax VQ; reference maskgit.py:117-134)."""

    def enc(frozen: FrozenStage1, x: jax.Array):
        s_l = encode_tokens(stage1_model, frozen, x, "lf")
        s_h = encode_tokens(stage1_model, frozen, x, "hf")
        return s_l, s_h

    return jax.jit(enc)


def precompute_token_dataset(
    stage1_model: Stage1Model,
    frozen: FrozenStage1,
    X,
    batch_size: int = 64,
    mesh=None,
):
    """One eval-mode sweep over X -> (tokens_l, tokens_h) numpy int32 arrays.

    Wrap-pads the tail to the fixed batch shape (one compiled program) and
    drops the pad rows, mirroring runner.eval_once's batching."""
    import numpy as np

    enc = make_token_encode_fn(stage1_model)
    # X may already be a device-resident jax.Array (runner's HBM-cached
    # train split) — then the per-batch slice is a device gather, not a
    # host->device transfer.
    if not isinstance(X, jax.Array):
        X = np.asarray(X)
    N = X.shape[0]
    bs = min(batch_size, N)
    if mesh is not None:
        m = mesh.devices.size
        bs = -(-bs // m) * m
    out_l, out_h = [], []
    for s in range(0, N, bs):
        idx = np.arange(s, s + bs) % N
        xb = X[idx] if isinstance(X, jax.Array) else jnp.asarray(X[idx])
        if mesh is not None:
            from tvqvae_tpu.parallel.mesh import shard_batch

            xb = shard_batch(mesh, xb)
        s_l, s_h = enc(frozen, xb)
        real = min(bs, N - s)
        out_l.append(np.asarray(s_l[:real]))
        out_h.append(np.asarray(s_h[:real]))
    return (
        np.concatenate(out_l).astype(np.int32),
        np.concatenate(out_h).astype(np.int32),
    )


def make_sampling_fn(
    stage1_model,
    t_l: BidirectionalTransformer,
    t_h: BidirectionalTransformer,
    spec: MaskGITSpec,
    mesh=None,
):
    """Jitted sampler over *current* prior params (used for validation-time
    metrics inside stage-2/3 training, reference stage2.py:87-109).

    Returns fn(frozen, params, h_stats, rng, num, class_index) ->
    (x_l, x_h, x). All parameter trees are ARGUMENTS (never closures): a
    closed-over frozen stage-1 tree would be baked into the HLO as hundreds
    of MB of constants, blowing up compile payloads.

    With `mesh`, outputs are constrained to batch-sharding over the `data`
    axis; GSPMD propagates the constraint backwards so the whole decode
    pipeline fans out over the mesh (`num` must divide by the mesh size).
    """
    import jax as _jax

    from tvqvae_tpu.models.maskgit import decode_tokens, iterative_decoding

    def sample(frozen: FrozenStage1, params, h_stats, rng, num: int, class_index):
        def apply_l(s_l, cond):
            return t_l.apply({"params": params["l"]}, s_l, None, cond, False)

        def apply_h(s_l, s_h, cond):
            return t_h.apply(
                {"params": params["h"], "batch_stats": h_stats},
                s_l, s_h, cond, False,
            )

        s_l, s_h = iterative_decoding(
            rng, spec, apply_l, apply_h, num, class_index
        )
        if mesh is not None:
            from tvqvae_tpu.parallel.mesh import data_sharding

            s_l = _jax.lax.with_sharding_constraint(
                s_l, data_sharding(mesh, s_l.ndim)
            )
            s_h = _jax.lax.with_sharding_constraint(
                s_h, data_sharding(mesh, s_h.ndim)
            )
        x_l = decode_tokens(stage1_model, frozen, s_l, "lf")
        x_h = decode_tokens(stage1_model, frozen, s_h, "hf")
        return x_l, x_h, x_l + x_h

    if mesh is None:
        return _jax.jit(sample, static_argnames=("num", "class_index"))
    from tvqvae_tpu.parallel.mesh import data_sharding

    shard3 = data_sharding(mesh, 3)
    return _jax.jit(
        sample,
        static_argnames=("num", "class_index"),
        out_shardings=(shard3, shard3, shard3),
    )


def make_ess_sampling_fn(
    stage1_model,
    t_l: BidirectionalTransformer,
    t_h: BidirectionalTransformer,
    spec: MaskGITSpec,
    error_ratio_ma_rate: float = 0.3,
):
    """Jitted ESS sampler (reference maskgit.py:479-679): naive LF decode ->
    critical reverse sampling -> critic-guided re-decode -> HF pass ->
    decoders, ONE device program per batch (the retraction loop is a
    lax.scan inside). Same argument convention as make_sampling_fn: all
    parameter trees are arguments, never closures."""
    import jax as _jax

    from tvqvae_tpu.models.maskgit import decode_tokens, iterative_decoding_ess

    def sample(frozen: FrozenStage1, params, h_stats, rng, num: int, class_index):
        def apply_l(s_l, cond):
            return t_l.apply({"params": params["l"]}, s_l, None, cond, False)

        def apply_h(s_l, s_h, cond):
            return t_h.apply(
                {"params": params["h"], "batch_stats": h_stats},
                s_l, s_h, cond, False,
            )

        s_l, s_h = iterative_decoding_ess(
            rng, spec, apply_l, apply_h,
            frozen.vq_l.embed, frozen.vq_h.embed,
            num, class_index, error_ratio_ma_rate,
        )
        x_l = decode_tokens(stage1_model, frozen, s_l, "lf")
        x_h = decode_tokens(stage1_model, frozen, s_h, "hf")
        return x_l, x_h, x_l + x_h

    return _jax.jit(sample, static_argnames=("num", "class_index"))


def make_prior_apply_fns(
    t_l: BidirectionalTransformer,
    t_h: BidirectionalTransformer,
    params,
    h_stats,
):
    """Eval-mode apply closures for the iterative decoder."""

    def apply_l(s_l, class_condition):
        return t_l.apply({"params": params["l"]}, s_l, None, class_condition, False)

    def apply_h(s_l, s_h, class_condition):
        return t_h.apply(
            {"params": params["h"], "batch_stats": h_stats},
            s_l, s_h, class_condition, False,
        )

    return apply_l, apply_h
