"""Fused Pallas TPU kernel for the VQ codebook hot loop.

Replaces the reference's per-step distance-matrix + argmax + one-hot +
stats sequence (timevqvae/models/vq.py:210-243, SURVEY.md hot loop #1) with
a single pass over the flattened batch:

  for each M-tile:   dist = -(|x|^2 - 2 x e^T + |e|^2)   (MXU matmul)
                     idx  = argmax_K dist                 (VPU)
                     counts    += onehot sums             (VPU)
                     embed_sum += onehot^T x              (MXU matmul)

The (M, K) one-hot matrix never round-trips through HBM — the EMA statistics
are accumulated in VMEM across grid steps (TPU grid iterations execute
sequentially, so the += accumulation into the constant-index output block is
safe). The codebook K is padded to the 128-lane boundary with +inf-distance
rows; padded batch rows are masked out of the statistics.

Used by tvqvae_tpu/models/vq.py when VQParams.use_pallas=True (argmax path;
the temperature-sampled SVQ path stays in XLA). Falls back to interpret mode
off-TPU so tests exercise the same code path on CPU.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(x_ref, e_ref, idx_ref, cnt_ref, es_ref, *, m_actual, tm):
    i = pl.program_id(0)
    x = x_ref[:]  # (TM, D)
    e = e_ref[:]  # (Kp, D)

    x2 = jnp.sum(x * x, axis=-1, keepdims=True)  # (TM, 1)
    e2 = jnp.sum(e * e, axis=-1)[None, :]  # (1, Kp)
    xe = jax.lax.dot_general(
        x, e, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # exact fp32 distances on MXU
    )  # (TM, Kp)
    dist = 2.0 * xe - x2 - e2  # = -(|x|^2 - 2 x.e + |e|^2)

    idx = jnp.argmax(dist, axis=-1).astype(jnp.int32)  # (TM,)
    idx_ref[:] = idx[:, None]

    kp = e.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], kp), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], kp), 0)
    valid = (i * tm + row) < m_actual  # mask padded batch rows
    onehot = jnp.where((col == idx[:, None]) & valid, 1.0, 0.0)  # (TM, Kp)

    cnt = jnp.sum(onehot, axis=0)[None, :]  # (1, Kp)
    es = jax.lax.dot_general(
        onehot, x, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (Kp, D)

    @pl.when(i == 0)
    def _():
        cnt_ref[:] = cnt
        es_ref[:] = es

    @pl.when(i > 0)
    def _():
        cnt_ref[:] = cnt_ref[:] + cnt
        es_ref[:] = es_ref[:] + es


@partial(jax.jit, static_argnames=("tile_m",))
def nearest_codes_stats_pallas(flat: jax.Array, embed: jax.Array, tile_m: int = 512):
    """(M, D) x (K, D) -> (indices (M,), counts (K,), embed_sum (K, D)).

    Single fused pass: assignment + EMA statistics, no (M, K) HBM traffic.
    """
    M, D = flat.shape
    K = embed.shape[0]
    Kp = max(_round_up(K, 128), 128)
    Mp = _round_up(max(M, tile_m), tile_m)
    Dp = max(_round_up(D, 128), 128)

    x = jnp.zeros((Mp, Dp), jnp.float32).at[:M, :D].set(flat.astype(jnp.float32))
    # Padded codebook rows get a huge coordinate so their distance is never
    # the argmax; padded D columns are zero on both sides (no effect).
    e = jnp.full((Kp, Dp), 0.0, jnp.float32)
    e = e.at[:K, :D].set(embed.astype(jnp.float32))
    e = e.at[K:, 0].set(1e18)

    grid = (Mp // tile_m,)
    interpret = jax.default_backend() != "tpu"
    idx, cnt, es = pl.pallas_call(
        partial(_kernel, m_actual=M, tm=tile_m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, Dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, Dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_m, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, Dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, Kp), jnp.float32),
            jax.ShapeDtypeStruct((Kp, Dp), jnp.float32),
        ],
        interpret=interpret,
    )(x, e)

    return idx[:M, 0], cnt[0, :K], es[:K, :D]


def nearest_codes_pallas(flat: jax.Array, embed: jax.Array):
    """Compatibility wrapper returning (indices, onehot) like the XLA path."""
    idx, _, _ = nearest_codes_stats_pallas(flat, embed)
    onehot = jax.nn.one_hot(idx, embed.shape[0], dtype=jnp.float32)
    return idx, onehot
