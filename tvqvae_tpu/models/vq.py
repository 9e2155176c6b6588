"""Vector quantization with an EMA-updated Euclidean codebook.

TPU-native re-design of the reference quantizer (timevqvae/models/vq.py,
itself derived from lucidrains/vector-quantize-pytorch). Differences in
*implementation*, parity in *semantics*:

  - The codebook (embed, embed_avg, cluster_size, initted) is explicit
    functional state (`CodebookState`) threaded through the jitted train
    step, not hidden nn.Module buffers (reference vq.py:157-165).
  - The hot loop — squared-L2 distances, nearest-code assignment, one-hot
    stats for the EMA update (reference vq.py:210-243) — runs either as
    plain XLA (matmul + argmax; fused well by the compiler) or as a fused
    Pallas TPU kernel (tvqvae_tpu/ops/vq_pallas.py).
  - Under pjit/GSPMD with the batch sharded over the `data` mesh axis, the
    `sum(0)` reductions that produce `cluster_size` and `embed_sum` lower to
    cross-device all-reduces automatically — the exact psum points the
    reference marks with its optional DDP all_reduce hooks (vq.py:155,229,234).

Semantics preserved from the reference:
  - assignment: argmax of -(|x|^2 - 2 x.e + |e|^2); with svq_temp > 0,
    a categorical sample of softmax(dist / temp) (vq.py:51-56,216-222;
    temp=0.0 means argmax because of the falsy-zero check there).
  - EMA: cluster_size <- decay*cluster_size + (1-decay)*batch_counts;
    embed_avg likewise with x^T onehot; embed <- embed_avg / laplace-
    smoothed cluster_size (vq.py:227-242). `quantize` uses the PRE-update
    embedding (vq.py:225 runs before the EMA block).
  - straight-through: q_st = x + stop_gradient(q - x) (vq.py:357-360).
  - commitment loss: mse(stop_gradient(q), x) * weight (vq.py:362-366).
  - optional k-means init on the first training batch (vq.py:170-179) and
    dead-code expiry below a cluster-size threshold (vq.py:181-195); both
    off under the published config (kmeans_init=False, threshold=0).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@dataclass(frozen=True)
class VQParams:
    """Static quantizer hyper-parameters."""

    codebook_size: int
    dim: int
    decay: float = 0.8
    eps: float = 1e-5
    commitment_weight: float = 1.0
    threshold_ema_dead_code: int = 0
    kmeans_init: bool = False
    kmeans_iters: int = 10
    use_pallas: bool = False


@struct.dataclass
class CodebookState:
    embed: jax.Array  # (K, D)
    embed_avg: jax.Array  # (K, D)
    cluster_size: jax.Array  # (K,)
    initted: jax.Array  # () bool


@struct.dataclass
class VQOutput:
    quantized: jax.Array  # (B, N, D) straight-through in train mode
    indices: jax.Array  # (B, N) int32
    loss: jax.Array  # scalar: commitment_weight * commit_loss
    commit_loss: jax.Array  # scalar
    perplexity: jax.Array  # scalar
    state: CodebookState  # updated (train) or unchanged (eval)


def init_codebook(rng: jax.Array, p: VQParams) -> CodebookState:
    if p.kmeans_init:
        embed = jnp.zeros((p.codebook_size, p.dim), jnp.float32)
        initted = jnp.asarray(False)
    else:
        embed = jax.random.normal(rng, (p.codebook_size, p.dim), jnp.float32)
        initted = jnp.asarray(True)
    return CodebookState(
        embed=embed,
        embed_avg=embed + 0.0,  # distinct buffer (donation-safe)
        cluster_size=jnp.zeros((p.codebook_size,), jnp.float32),
        initted=initted,
    )


def _neg_sq_dist(x: jax.Array, embed: jax.Array) -> jax.Array:
    """-(|x|^2 - 2 x.e^T + |e|^2): (M, D), (K, D) -> (M, K)."""
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    e2 = jnp.sum(embed * embed, axis=-1)[None, :]
    xe = jax.lax.dot_general(
        x, embed, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # exact fp32 distances on TPU
    )
    return -(x2 - 2.0 * xe + e2)


def kmeans(
    rng: jax.Array, samples: jax.Array, num_clusters: int, num_iters: int = 10
) -> Tuple[jax.Array, jax.Array]:
    """Plain-Lloyd k-means on (M, D) samples; returns (means, bins).

    Device-side equivalent of reference vq.py:78-106 (random-row init,
    empty clusters keep their previous mean).
    """
    M = samples.shape[0]
    idx = jax.random.randint(rng, (num_clusters,), 0, M)
    means = samples[idx]

    def body(_, means):
        dists = _neg_sq_dist(samples, means)
        buckets = jnp.argmax(dists, axis=-1)
        onehot = jax.nn.one_hot(buckets, num_clusters, dtype=samples.dtype)
        bins = onehot.sum(axis=0)
        sums = jax.lax.dot_general(
            onehot, samples, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        new_means = sums / jnp.maximum(bins, 1.0)[:, None]
        return jnp.where((bins == 0)[:, None], means, new_means)

    means = jax.lax.fori_loop(0, num_iters, body, means)
    dists = _neg_sq_dist(samples, means)
    buckets = jnp.argmax(dists, axis=-1)
    bins = jax.nn.one_hot(buckets, num_clusters, dtype=samples.dtype).sum(0)
    return means, bins


def _assign(
    flat: jax.Array,
    embed: jax.Array,
    svq_temp: Optional[float],
    rng: Optional[jax.Array],
) -> jax.Array:
    """Nearest-code (or temperature-sampled) assignment. (M, D) -> (M,)."""
    dist = _neg_sq_dist(flat, embed)
    if svq_temp is None or svq_temp == 0.0:
        return jnp.argmax(dist, axis=-1).astype(jnp.int32)
    assert rng is not None, "svq sampling needs an rng"
    return jax.random.categorical(rng, dist / svq_temp, axis=-1).astype(jnp.int32)


def vq_forward(
    state: CodebookState,
    x: jax.Array,
    p: VQParams,
    *,
    train: bool,
    svq_temp: Optional[float] = None,
    rng: Optional[jax.Array] = None,
) -> VQOutput:
    """Quantize (B, N, D) -> VQOutput.

    In train mode the codebook state advances one EMA step and the output is
    the straight-through estimator; in eval mode state is returned unchanged.
    """
    B, N, D = x.shape
    K = p.codebook_size
    flat = x.reshape(B * N, D).astype(jnp.float32)

    if train and p.kmeans_init:
        assert rng is not None, "kmeans init needs an rng"
        rng, krng = jax.random.split(rng)

        def do_init(s):
            means, bins = kmeans(krng, flat, K, p.kmeans_iters)
            return CodebookState(
                embed=means, embed_avg=means, cluster_size=bins,
                initted=jnp.asarray(True),
            )

        state = jax.lax.cond(state.initted, lambda s: s, do_init, state)

    if train and svq_temp is not None and svq_temp > 0.0:
        assert rng is not None
        rng, arng = jax.random.split(rng)
    else:
        arng = rng

    if p.use_pallas and (svq_temp is None or svq_temp == 0.0):
        from tvqvae_tpu.ops.vq_pallas import nearest_codes_stats_pallas

        # stop_gradient is EXACT here, not an approximation: none of the
        # kernel outputs carries a tangent in the loss graph (indices are
        # integer; counts/embed_sum feed only the EMA state, which is aux)
        # — and without it jax.grad attempts a JVP of the kernel, which
        # trips pallas' program_id-outside-grid assertion (found by the
        # round-5 in-situ bench run; pinned by test_vq_pallas_under_grad)
        indices, counts, embed_sum = nearest_codes_stats_pallas(
            jax.lax.stop_gradient(flat), jax.lax.stop_gradient(state.embed)
        )
    else:
        indices = _assign(flat, state.embed, svq_temp, arng)
        onehot = jax.nn.one_hot(indices, K, dtype=jnp.float32)
        counts = onehot.sum(axis=0)  # (K,) — all-reduced under GSPMD
        embed_sum = jax.lax.dot_general(
            flat, onehot, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).T  # contraction over M gives (D, K); transpose to (K, D)

    quantized = jnp.take(state.embed, indices, axis=0)  # pre-EMA embed

    new_state = state
    if train:
        cluster_size = state.cluster_size * p.decay + counts * (1.0 - p.decay)
        embed_avg = state.embed_avg * p.decay + embed_sum * (1.0 - p.decay)
        n = cluster_size.sum()
        smoothed = (cluster_size + p.eps) / (n + K * p.eps) * n
        embed = embed_avg / smoothed[:, None]

        if p.threshold_ema_dead_code > 0:
            assert rng is not None, "dead-code expiry needs an rng"
            rng, erng = jax.random.split(rng)
            expired = cluster_size < p.threshold_ema_dead_code
            ridx = jax.random.randint(erng, (K,), 0, flat.shape[0])
            embed = jnp.where(expired[:, None], flat[ridx], embed)

        new_state = CodebookState(
            embed=embed, embed_avg=embed_avg, cluster_size=cluster_size,
            initted=state.initted,
        )

    commit_loss = jnp.mean(
        (jax.lax.stop_gradient(quantized) - flat) ** 2
    ) if train else jnp.float32(0.0)
    loss = commit_loss * p.commitment_weight

    avg_probs = counts / flat.shape[0]
    perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))

    q = quantized.reshape(B, N, D)
    if train:
        xr = x.astype(jnp.float32)
        q = xr + jax.lax.stop_gradient(q - xr)

    return VQOutput(
        quantized=q,
        indices=indices.reshape(B, N),
        loss=loss,
        commit_loss=commit_loss,
        perplexity=perplexity,
        state=new_state,
    )


def lookup_codes(state: CodebookState, indices: jax.Array) -> jax.Array:
    """Token indices -> codebook vectors (the decode-time embedding lookup,
    reference maskgit.py:465)."""
    return jnp.take(state.embed, indices, axis=0)
