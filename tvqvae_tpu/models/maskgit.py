"""MaskGIT prior: masked-token training and iterative parallel decoding.

Reference: timevqvae/models/maskgit.py. TPU-first re-design:

  - The frozen stage-1 network travels as an explicit `FrozenStage1` bundle
    (params + batch stats + codebooks, all non-trainable), not by loading a
    Lightning checkpoint inside the model constructor (reference
    maskgit.py:52-69 — the cross-layer coupling SURVEY.md §1 flags).
  - Training masking (random cosine-schedule keep counts, exactly-k per row;
    reference :194-216) is a batched rank trick: rank(random) < n_keep.
  - Iterative decoding (reference :294-446) is a `lax.scan` over decode
    steps. Because every sample starts fully masked, the per-step mask
    length floor(n * gamma((t+1)/T)) is STATIC — precomputed host-side —
    and the per-row "mask the k least confident" op is rank(confidence) < k,
    so the whole sampler jit-compiles to one program (hot loop #2 in
    SURVEY.md §3).
  - Classifier-free guidance mixes cond/uncond logits
    (logits_null + scale*(logits - logits_null), reference :136-153); for
    cfg_scale == 1 the null pass is skipped (static branch).

Gamma schedules: reference :218-228.
"""

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from tvqvae_tpu.config import Config
from tvqvae_tpu.models.stage1 import Stage1Model, Stage1Spec
from tvqvae_tpu.models.transformer import BidirectionalTransformer
from tvqvae_tpu.models.vq import CodebookState, lookup_codes, vq_forward


# --------------------------------------------------------------------------
# schedule helpers


def gamma_fn(mode: str = "cosine") -> Callable[[np.ndarray], np.ndarray]:
    if mode == "linear":
        return lambda r: 1.0 - r
    if mode == "cosine":
        return lambda r: np.cos(r * np.pi / 2.0)
    if mode == "square":
        return lambda r: 1.0 - r ** 2
    if mode == "cubic":
        return lambda r: 1.0 - r ** 3
    raise NotImplementedError(mode)


def gamma_fn_jnp(mode: str = "cosine") -> Callable[[jax.Array], jax.Array]:
    if mode == "linear":
        return lambda r: 1.0 - r
    if mode == "cosine":
        return lambda r: jnp.cos(r * jnp.pi / 2.0)
    if mode == "square":
        return lambda r: 1.0 - r ** 2
    if mode == "cubic":
        return lambda r: 1.0 - r ** 3
    raise NotImplementedError(mode)


def decode_schedule(num_tokens: int, T: int, choice_temp: float, mode: str):
    """Static per-step (mask_len, temperature) tables (reference :318-343)."""
    g = gamma_fn(mode)
    ratios = (np.arange(T) + 1.0) / T
    mask_lens = np.clip(
        np.floor(num_tokens * g(ratios)), 0, None
    ).astype(np.int32)
    temps = (choice_temp * (1.0 - ratios)).astype(np.float32)
    return jnp.asarray(mask_lens), jnp.asarray(temps)


def _rank(x: jax.Array, axis: int = -1) -> jax.Array:
    """Rank of each element when sorted ascending (ties by position)."""
    order = jnp.argsort(x, axis=axis)
    return jnp.argsort(order, axis=axis)


# --------------------------------------------------------------------------
# frozen stage-1 bundle


@struct.dataclass
class FrozenStage1:
    params: dict
    batch_stats: dict
    vq_l: CodebookState
    vq_h: CodebookState


def encode_tokens(
    model: Stage1Model,
    frozen: FrozenStage1,
    x: jax.Array,
    band: str,
    svq_temp: Optional[float] = None,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """x -> token indices through the frozen stage-1 encoder + quantizer
    (reference maskgit.py:117-134; eval-mode BN, reference :161-164)."""
    z = model.apply(
        {"params": frozen.params, "batch_stats": frozen.batch_stats},
        x, band, method="encode",
    )
    vq_state = frozen.vq_l if band == "lf" else frozen.vq_h
    vq_params = model.spec.vq_l if band == "lf" else model.spec.vq_h
    out = vq_forward(
        vq_state, z, vq_params, train=False, svq_temp=svq_temp, rng=rng
    )
    return out.indices


def decode_tokens(
    model: Stage1Model, frozen: FrozenStage1, s: jax.Array, band: str
) -> jax.Array:
    """Token indices -> time series through the frozen stage-1 decoder
    (reference maskgit.py:448-477)."""
    vq_state = frozen.vq_l if band == "lf" else frozen.vq_h
    zq = lookup_codes(vq_state, s)  # (B, N, D)
    return model.apply(
        {"params": frozen.params, "batch_stats": frozen.batch_stats},
        zq, band, method="decode",
    )


# --------------------------------------------------------------------------
# training-time masking + loss


def random_mask_tokens(
    rng: jax.Array, s: jax.Array, mask_token: int, mode: str = "cosine"
) -> Tuple[jax.Array, jax.Array]:
    """Reference maskgit.py:194-216: per-row uniform ratio -> cosine keep
    count in [0, n-1] -> exactly that many random positions kept.
    Returns (masked tokens, keep mask) with True = kept."""
    B, n = s.shape
    r_ratio, r_pos = jax.random.split(rng)
    ratio = jax.random.uniform(r_ratio, (B,))
    g = gamma_fn_jnp(mode)
    n_keep = jnp.clip(jnp.floor(g(ratio) * n), 0, n - 1).astype(jnp.int32)
    scores = jax.random.uniform(r_pos, (B, n))
    # keep the n_keep highest-scored positions per row (exact count)
    keep = _rank(-scores, axis=-1) < n_keep[:, None]
    s_M = jnp.where(keep, s, mask_token)
    return s_M, keep


def masked_ce(logits: jax.Array, targets: jax.Array, keep: jax.Array) -> jax.Array:
    """Cross-entropy averaged over MASKED positions only (reference :183-189)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    w = (~keep).astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


# --------------------------------------------------------------------------
# MaskGIT bundle


@dataclass(frozen=True)
class MaskGITSpec:
    tokens_l: int
    tokens_h: int
    mask_token_l: int
    mask_token_h: int
    T_l: int
    T_h: int
    choice_temp_l: float
    choice_temp_h: float
    cfg_scale: float

    @staticmethod
    def from_config(cfg: Config, s1: Stage1Spec) -> "MaskGITSpec":
        return MaskGITSpec(
            tokens_l=s1.tokens_l,
            tokens_h=s1.tokens_h,
            mask_token_l=s1.vq_l.codebook_size,
            mask_token_h=s1.vq_h.codebook_size,
            T_l=cfg.maskgit.T["lf"],
            T_h=cfg.maskgit.T["hf"],
            choice_temp_l=float(cfg.maskgit.choice_temperatures["lf"]),
            choice_temp_h=float(cfg.maskgit.choice_temperatures["hf"]),
            cfg_scale=float(cfg.maskgit.cfg_scale),
        )


def build_transformers(
    cfg: Config, s1: Stage1Spec, n_classes: int,
    force_projections: bool = False,
) -> Tuple[BidirectionalTransformer, BidirectionalTransformer]:
    """force_projections: set when loading an imported reference stage-2
    checkpoint (its meta records it) — keeps x-transformers' square
    project_in/out Linears that fresh training here omits."""
    mk = lambda kind, pm, n_tok: BidirectionalTransformer(
        force_projections=force_projections,
        kind=kind,
        num_tokens=n_tok,
        codebook_size_l=s1.vq_l.codebook_size,
        codebook_size_h=s1.vq_h.codebook_size,
        embed_dim=s1.hid_dim,
        hidden_dim=pm.hidden_dim,
        n_layers=pm.n_layers,
        heads=pm.heads,
        ff_mult=pm.ff_mult,
        use_rmsnorm=pm.use_rmsnorm,
        p_unconditional=pm.p_unconditional,
        n_classes=n_classes,
        model_dropout=pm.model_dropout,
        emb_dropout=pm.emb_dropout,
    )
    t_l = mk("lf", cfg.maskgit.prior_model_l, s1.tokens_l)
    t_h = mk("hf", cfg.maskgit.prior_model_h, s1.tokens_h)
    return t_l, t_h


# --------------------------------------------------------------------------
# iterative decoding (sampling)


def _masked_prediction(
    apply_fn: Callable,
    cfg_scale: float,
    class_condition: Optional[jax.Array],
    *s_in,
) -> jax.Array:
    """CFG logit mixing (reference maskgit.py:136-153)."""
    if class_condition is None:
        return apply_fn(*s_in, None)
    if cfg_scale == 1.0:
        return apply_fn(*s_in, class_condition)
    logits_null = apply_fn(*s_in, None)
    logits = apply_fn(*s_in, class_condition)
    return logits_null + cfg_scale * (logits - logits_null)


def _gumbel(rng, shape):
    u = jax.random.uniform(rng, shape, minval=1e-20, maxval=1.0)
    return -jnp.log(-jnp.log(u))


def decode_band_scan(
    rng: jax.Array,
    apply_fn: Callable,
    s_init: jax.Array,
    mask_token: int,
    T: int,
    num_tokens: int,
    choice_temp: float,
    cfg_scale: float,
    class_condition: Optional[jax.Array],
    mode: str = "cosine",
) -> jax.Array:
    """One band's iterative decoding loop as a lax.scan
    (reference first_pass/second_pass, maskgit.py:294-411).

    apply_fn(s, class_condition) -> logits closes over the other band's
    tokens for the HF pass.
    """
    mask_lens, temps = decode_schedule(num_tokens, T, choice_temp, mode)
    step_rngs = jax.random.split(rng, T)

    def body(s, inp):
        step_rng, mask_len, temp = inp
        r_sample, r_gumbel = jax.random.split(step_rng)

        logits = _masked_prediction(
            apply_fn, cfg_scale, class_condition, s
        )  # (B, n, K)
        sampled = jax.random.categorical(r_sample, logits, axis=-1)
        unknown = s == mask_token
        sampled = jnp.where(unknown, sampled, s)

        probs = jax.nn.softmax(logits, axis=-1)
        sel = jnp.take_along_axis(probs, sampled[..., None], axis=-1)[..., 0]
        sel = jnp.where(unknown, sel, jnp.inf)  # known tokens never re-mask

        confidence = jnp.log(sel + 1e-5) + temp * _gumbel(r_gumbel, sel.shape)
        masking = _rank(confidence, axis=-1) < mask_len  # lowest-k re-masked
        s = jnp.where(masking, mask_token, sampled)
        return s, None

    s, _ = jax.lax.scan(body, s_init, (step_rngs, mask_lens, temps))
    return s


def iterative_decoding(
    rng: jax.Array,
    spec: MaskGITSpec,
    apply_l: Callable,  # (s_l, class_condition) -> logits
    apply_h_given: Callable,  # (s_l, s_h, class_condition) -> logits
    num: int,
    class_index: Optional[int] = None,
    mode: str = "cosine",
) -> Tuple[jax.Array, jax.Array]:
    """Sample LF then HF token grids (reference maskgit.py:413-446)."""
    r_l, r_h = jax.random.split(rng)
    cond = (
        jnp.full((num, 1), class_index, jnp.int32)
        if class_index is not None
        else None
    )

    s_l = jnp.full((num, spec.tokens_l), spec.mask_token_l, jnp.int32)
    s_l = decode_band_scan(
        r_l, apply_l, s_l, spec.mask_token_l, spec.T_l, spec.tokens_l,
        spec.choice_temp_l, spec.cfg_scale, cond, mode,
    )

    s_h = jnp.full((num, spec.tokens_h), spec.mask_token_h, jnp.int32)
    apply_h = lambda s, c: apply_h_given(s_l, s, c)
    s_h = decode_band_scan(
        r_h, apply_h, s_h, spec.mask_token_h, spec.T_h, spec.tokens_h,
        spec.choice_temp_h, spec.cfg_scale, cond, mode,
    )
    return s_l, s_h


# --------------------------------------------------------------------------
# ESS — Enhanced Sampling Scheme (reference maskgit.py:479-679)
#
# Disabled in the published reference config ("under maintenance",
# configs/config.yaml:66-68) and therefore off by default here too
# (Config.maskgit.ess_use). The reference computes per-token confidence with
# an O(n) Python loop of forward passes (:654-679); here all n single-token
# re-maskings run as ONE batched transformer pass.


def compute_confidence_score(
    apply_fn: Callable,
    s: jax.Array,
    mask_token: int,
    embed: jax.Array,
    class_condition: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-token self-critic confidence (reference :654-679).

    For each position i: mask it, predict it, and score
    -||E[s_i] - E[pred_i]||^2; softmax over positions. The n variants are
    evaluated in one (n*b, n) batched pass.
    """
    b, n = s.shape
    eye = jnp.eye(n, dtype=bool)
    variants = jnp.where(eye[:, None, :], mask_token, s[None])  # (n, b, n)
    flat = variants.reshape(n * b, n)
    cond = (
        jnp.tile(class_condition, (n, 1))
        if class_condition is not None else None
    )
    logits = apply_fn(flat, cond)  # (n*b, n, K)
    K = logits.shape[-1]
    logits = logits.reshape(n, b, n, K)
    diag = jax.vmap(lambda lg, i: lg[:, i], in_axes=(0, 0))(
        logits, jnp.arange(n)
    )  # (n, b, K)
    pred = jnp.argmax(diag, axis=-1)  # (n, b)
    z_true = jnp.take(embed, s.T, axis=0)  # (n, b, d)
    z_pred = jnp.take(embed, pred, axis=0)
    dist = jnp.sum((z_true - z_pred) ** 2, axis=-1)  # (n, b)
    return jax.nn.softmax(-dist.T, axis=-1)  # (b, n)


def critical_reverse_sampling(
    apply_fn: Callable,
    s: jax.Array,
    confidence_scores: jax.Array,
    mask_token: int,
    T: int,
    num_tokens: int,
    embed: jax.Array,
    class_condition: Optional[jax.Array] = None,
    error_ratio_ma_rate: float = 0.3,
    mode: str = "cosine",
):
    """Step retraction: walk back from t=T-1 removing unrealistic tokens
    until the prediction-error ratio stops improving (reference :479-594).

    Device-resident: a single lax.scan over t = T-1..1 with the error-ratio
    moving average carried as a fixed-size ring buffer; once the stop
    condition fires the remaining iterations skip the transformer forward via
    lax.cond. (The reference runs a Python loop of device round-trips; this
    is one compiled program, jit/vmap-safe.)
    """
    g = gamma_fn_jnp(mode)
    w = max(1, round(T * error_ratio_ma_rate))  # moving-average window
    conf_rank = _rank(confidence_scores, axis=-1)
    z_true = jnp.take(embed, s, axis=0)

    def mask_len(tf):
        return jnp.clip(
            jnp.floor(num_tokens * g(tf / T)), 0, None
        ).astype(jnp.int32)

    # fallback (reference :585-594, reached only when T <= 1): t_star=1 and
    # re-mask with the t=2 schedule length
    init = (
        jnp.asarray(False),  # done
        jnp.asarray(1, jnp.int32),  # t_star
        jnp.where(conf_rank < mask_len(jnp.float32(2.0)), mask_token, s),
        jnp.asarray(0.0, jnp.float32),  # prev error
        jnp.zeros((w,), jnp.float32),  # ring buffer of error ratios
        jnp.asarray(0, jnp.int32),  # ratios pushed so far
    )

    def body(carry, t):
        done, t_star, s_star, prev, ring, count = carry
        tf = t.astype(jnp.float32)
        ml_t = mask_len(tf + 1.0)
        ml_tm1 = mask_len(tf)
        masking_t = conf_rank < ml_t
        masked_t = jnp.where(masking_t, mask_token, s)
        stop_eq = ml_t == ml_tm1  # schedule plateau: stop before forward
        need_fwd = (~done) & (~stop_eq)

        def forward_path(op):
            prev, ring, count = op
            s_tm1 = jnp.where(conf_rank < ml_tm1, mask_token, s)
            logits = apply_fn(s_tm1, class_condition)
            s_hat = jnp.argmax(logits, axis=-1)
            z_pred = jnp.take(embed, s_hat, axis=0)
            sq = jnp.sum((z_true - z_pred) ** 2, axis=-1)
            interest = (conf_rank < ml_tm1) & (~masking_t)  # revealed at t
            err = jnp.sum(jnp.where(interest, sq, 0.0)) / jnp.maximum(
                jnp.sum(interest), 1
            )
            is_first = t == T - 1  # first iteration only seeds prev_error
            ratio = err / (prev + 1e-5)
            pushed = ring.at[count % w].set(ratio)
            new_ring = jnp.where(is_first, ring, pushed)
            new_count = jnp.where(is_first, count, count + 1)
            n_valid = jnp.minimum(new_count, w)
            valid = jnp.arange(w) < n_valid
            ma = jnp.sum(jnp.where(valid, new_ring, 0.0)) / jnp.maximum(
                n_valid, 1
            )
            stop_hist = (~is_first) & (ma > 1.0)
            return err, new_ring, new_count, stop_hist

        def skip_path(op):
            prev, ring, count = op
            return prev, ring, count, jnp.asarray(False)

        err, ring, count, stop_hist = jax.lax.cond(
            need_fwd, forward_path, skip_path, (prev, ring, count)
        )
        stop_now = (~done) & (stop_eq | stop_hist | (t == 1))
        return (
            done | stop_now,
            jnp.where(stop_now, t, t_star),
            jnp.where(stop_now, masked_t, s_star),
            jnp.where(need_fwd, err, prev),
            ring,
            count,
        ), None

    ts = jnp.arange(T - 1, 0, -1)
    (_, t_star, s_star, _, _, _), _ = jax.lax.scan(body, init, ts)
    return t_star, s_star


def decode_with_token_critic(
    rng: jax.Array,
    apply_fn: Callable,
    s: jax.Array,
    t_star,
    mask_token: int,
    T: int,
    num_tokens: int,
    choice_temp: float,
    embed: jax.Array,
    class_condition: Optional[jax.Array] = None,
    mode: str = "cosine",
):
    """Resume decoding from t_star with self-token-critic confidences
    (reference :596-652). Device loop: lax.scan over all t in [1, T) with
    steps before t_star skipped via lax.cond (t_star may be a traced scalar
    from critical_reverse_sampling)."""
    g = gamma_fn_jnp(mode)

    def body(s, t):
        def active(s):
            r_s, r_g = jax.random.split(jax.random.fold_in(rng, t))
            logits = apply_fn(s, class_condition)
            sampled = jax.random.categorical(r_s, logits, axis=-1)
            conf = compute_confidence_score(
                apply_fn, sampled, mask_token, embed, class_condition
            )
            ratio = (t.astype(jnp.float32) + 1.0) / T
            ml = jnp.clip(
                jnp.floor(num_tokens * g(ratio)), 0, None
            ).astype(jnp.int32)
            temp = choice_temp * (1.0 - ratio)
            confidence = jnp.log(conf + 1e-5) + temp * _gumbel(r_g, conf.shape)
            masking = _rank(confidence, axis=-1) < ml
            return jnp.where(masking, mask_token, sampled)

        return jax.lax.cond(t >= t_star, active, lambda x: x, s), None

    s, _ = jax.lax.scan(body, s, jnp.arange(1, T))
    return s


def iterative_decoding_ess(
    rng: jax.Array,
    spec: MaskGITSpec,
    apply_l: Callable,
    apply_h: Callable,
    embed_l: jax.Array,
    embed_h: jax.Array,
    num: int,
    class_index: Optional[int] = None,
    error_ratio_ma_rate: float = 0.3,
    mode: str = "cosine",
) -> Tuple[jax.Array, jax.Array]:
    """Naive LF decode -> critical reverse sampling -> critic-guided
    re-decode, then the standard HF pass (the path reference first_pass
    sketches at maskgit.py:348-353 with ESS enabled)."""
    r_l, r_crit, r_h = jax.random.split(rng, 3)
    cond = (
        jnp.full((num, 1), class_index, jnp.int32)
        if class_index is not None else None
    )

    s_l = jnp.full((num, spec.tokens_l), spec.mask_token_l, jnp.int32)
    s_l = decode_band_scan(
        r_l, apply_l, s_l, spec.mask_token_l, spec.T_l, spec.tokens_l,
        spec.choice_temp_l, spec.cfg_scale, cond, mode,
    )
    conf = compute_confidence_score(
        apply_l, s_l, spec.mask_token_l, embed_l, cond
    )
    t_star, s_star = critical_reverse_sampling(
        apply_l, s_l, conf, spec.mask_token_l, spec.T_l, spec.tokens_l,
        embed_l, cond, error_ratio_ma_rate, mode,
    )
    s_l = decode_with_token_critic(
        r_crit, apply_l, s_star, t_star, spec.mask_token_l, spec.T_l,
        spec.tokens_l, spec.choice_temp_l, embed_l, cond, mode,
    )

    s_h = jnp.full((num, spec.tokens_h), spec.mask_token_h, jnp.int32)
    apply_h_fixed = lambda s, c: apply_h(s_l, s, c)
    s_h = decode_band_scan(
        r_h, apply_h_fixed, s_h, spec.mask_token_h, spec.T_h, spec.tokens_h,
        spec.choice_temp_h, spec.cfg_scale, cond, mode,
    )
    return s_l, s_h
