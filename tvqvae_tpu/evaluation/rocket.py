"""ROCKET / MiniRocket feature extraction as jitted XLA ops.

The reference runs ROCKET through numba-JIT CPU loops
(timevqvae/evaluation/rocket_functions.py:21-127 — `generate_kernels`,
`apply_kernel`, `apply_kernels` with prange) — its only "native" kernels
(SURVEY.md §2). Here the kernel bank is generated host-side with identical
distributions and applied on TPU as a batched shifted-gather contraction:

    out[b, k, i] = bias_k + sum_j w[k, j] * X[b, i - pad_k + j * dil_k]

looped over the (at most 11) kernel taps, chunked over kernels so the
(B, K_chunk, L) intermediate stays small, then fused PPV/max reductions.
Feature layout matches the reference: (B, 2*K) with [ppv, max] per kernel
(rocket_functions.py:94-127); L2 normalization is applied by the caller
(metrics engine), as in the reference (metrics.py:124).

MiniRocket (reference :131-207; the stage-3 perceptual net) groups its 84
fixed two-valued kernels by dilation and runs one rhs-dilated conv per
dilation; biases are data-dependent quantiles captured on a fitting batch
(the reference computes them lazily on its first forward). Note the
reference pads with `len(kernel_tensor)//2` where `len()` of a (1,1,k)
tensor is 1, i.e. effectively zero padding — reproduced here as VALID.
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class RocketKernels:
    weights: np.ndarray  # (K, max_len) zero-padded
    lengths: np.ndarray  # (K,)
    biases: np.ndarray  # (K,)
    dilations: np.ndarray  # (K,)
    paddings: np.ndarray  # (K,)
    input_length: int


def generate_kernels(
    input_length: int, num_kernels: int = 1000, seed: int = 0
) -> RocketKernels:
    """Random kernel bank with the reference's distributions
    (rocket_functions.py:21-56): lengths in {7,9,11}, N(0,1) mean-centered
    weights, U(-1,1) bias, log-uniform integer dilation, random padding."""
    rng = np.random.RandomState(seed)
    candidate = np.array([7, 9, 11], np.int32)
    lengths = rng.choice(candidate, num_kernels)
    max_len = int(candidate.max())

    weights = np.zeros((num_kernels, max_len), np.float64)
    biases = rng.uniform(-1.0, 1.0, num_kernels)
    dilations = np.zeros(num_kernels, np.int32)
    paddings = np.zeros(num_kernels, np.int32)
    for i in range(num_kernels):
        ln = lengths[i]
        w = rng.normal(0, 1, ln)
        weights[i, :ln] = w - w.mean()
        dilation = np.int32(
            2 ** rng.uniform(0, np.log2((input_length - 1) / (ln - 1)))
        )
        dilations[i] = dilation
        paddings[i] = ((ln - 1) * dilation) // 2 if rng.randint(2) == 1 else 0
    return RocketKernels(
        weights=weights.astype(np.float32),
        lengths=lengths.astype(np.int32),
        biases=biases.astype(np.float32),
        dilations=dilations.astype(np.int32),
        paddings=paddings.astype(np.int32),
        input_length=input_length,
    )


@partial(jax.jit, static_argnames=("i_max", "sig_len", "chunk"))
def _rocket_features(
    xb: jax.Array,  # (B, L)
    w: jax.Array,  # (K, J)
    b: jax.Array,  # (K,)
    d: jax.Array,  # (K,)
    p: jax.Array,  # (K,)
    ol: jax.Array,  # (K,)
    i_max: int,
    sig_len: int,
    chunk: int = 125,
) -> jax.Array:
    B = xb.shape[0]
    K, J = w.shape
    i_grid = jnp.arange(i_max, dtype=jnp.int32)

    def kernel_chunk(ws, bs, ds, ps, ols):
        def tap(j, acc):
            pos = i_grid[None, :] - ps[:, None] + j * ds[:, None]  # (Kc, I)
            valid = (pos >= 0) & (pos < sig_len)
            vals = jnp.take(xb, jnp.clip(pos, 0, sig_len - 1), axis=-1)
            vals = jnp.where(valid[None], vals, 0.0)  # (B, Kc, I)
            return acc + ws[:, j][None, :, None] * vals

        acc = jax.lax.fori_loop(
            0, J, tap, jnp.zeros((B, ws.shape[0], i_max), jnp.float32)
        )
        acc = acc + bs[None, :, None]
        valid_i = i_grid[None, :] < ols[:, None]  # (Kc, I)
        ppv = jnp.sum(
            ((acc > 0) & valid_i[None]).astype(jnp.float32), axis=-1
        ) / ols[None].astype(jnp.float32)
        mx = jnp.max(jnp.where(valid_i[None], acc, -jnp.inf), axis=-1)
        return ppv, mx

    ppvs, mxs = [], []
    for s in range(0, K, chunk):
        e = min(s + chunk, K)
        ppv, mx = kernel_chunk(w[s:e], b[s:e], d[s:e], p[s:e], ol[s:e])
        ppvs.append(ppv)
        mxs.append(mx)
    ppv = jnp.concatenate(ppvs, axis=1)
    mx = jnp.concatenate(mxs, axis=1)
    return jnp.stack([ppv, mx], axis=-1).reshape(B, 2 * K)


def _device_bank(kernels: RocketKernels):
    """Device-resident copy of the kernel bank, cached ON the bank object
    itself: numpy leaves passed to a jitted fn are re-uploaded host->device
    on EVERY call (the same bug class as the trained-sampler fix, PERF.md
    "param-upload fix"), so upload each bank once. Storing the cache on the
    instance (not a module-level id()-keyed dict) lets it die with the bank
    — a long-lived process that builds fresh banks per evaluation no longer
    leaks HBM (ADVICE r3 #2)."""
    hit = getattr(kernels, "_device_cache", None)
    if hit is not None:
        return hit
    L = kernels.input_length
    out_lens = (
        L + 2 * kernels.paddings - (kernels.lengths - 1) * kernels.dilations
    ).astype(np.int32)
    args = jax.device_put((
        jnp.asarray(kernels.weights),
        jnp.asarray(kernels.biases),
        jnp.asarray(kernels.dilations),
        jnp.asarray(kernels.paddings),
        jnp.asarray(out_lens),
    ))
    I = int(out_lens.max())
    kernels._device_cache = (args, I)
    return args, I


def apply_kernels(
    x: np.ndarray, kernels: RocketKernels, batch: int = 256
) -> np.ndarray:
    """(B, L) float -> (B, 2K) [ppv, max] features (reference :94-127)."""
    L = kernels.input_length
    args, I = _device_bank(kernels)
    outs = []
    xf = np.asarray(x, np.float32)
    for s in range(0, xf.shape[0], batch):
        xb = xf[s:s + batch]
        pad = 0
        if xb.shape[0] < batch and xf.shape[0] > batch:
            pad = batch - xb.shape[0]  # keep one compiled shape
            xb = np.pad(xb, ((0, pad), (0, 0)))
        feats = np.asarray(_rocket_features(jnp.asarray(xb), *args, I, L))
        outs.append(feats[: feats.shape[0] - pad if pad else feats.shape[0]])
    return np.concatenate(outs, axis=0)


# --------------------------------------------------------------------------
# MiniRocket


class MiniRocket:
    """MiniRocket transform (reference rocket_functions.py:131-207), used as
    the optional stage-3 perceptual feature net. Call `fit(x)` once to
    capture the quantile biases, then `__call__` is a pure jitted map."""

    kernel_length = 9
    num_kernels = 84

    def __init__(self, input_length: int, num_features: int = 10000, seed: int = 0):
        rng = np.random.RandomState(seed)
        kernels = []
        for _ in range(self.num_kernels):
            k = rng.choice([-1.0, 2.0], size=self.kernel_length, p=[2 / 3, 1 / 3])
            if k.sum() != 0:
                kernels.append(k)
        self.kernels = np.asarray(kernels, np.float32)  # (Kk, 9)
        max_dilation = (input_length - 1) // (self.kernel_length - 1)
        dil = np.logspace(
            0, np.log10(max(max_dilation, 1)), num=self.num_kernels, base=2,
            dtype=int,
        )
        self.dilations = [int(v) for v in np.unique(dil)]
        self.num_features = num_features
        self.biases = None  # (n_dil, Kk, 3) after fit

    def _convs(self, x: jax.Array) -> list:
        """x: (B, C, L); uses channel 0 (reference operates univariate)."""
        xb = x[:, :1, :]
        kern = jnp.asarray(self.kernels)[:, None, :]  # (Kk, 1, 9)
        outs = []
        for d in self.dilations:
            out = jax.lax.conv_general_dilated(
                xb, kern, window_strides=(1,), padding="VALID",
                rhs_dilation=(d,),
                dimension_numbers=("NCH", "OIH", "NCH"),
            )  # (B, Kk, L_out)
            outs.append(out)
        return outs

    def fit(self, x: np.ndarray) -> "MiniRocket":
        xb = jnp.asarray(np.asarray(x, np.float32))
        biases = []
        for out in self._convs(xb):
            qs = [
                jnp.quantile(out, (i + 1) / 4.0, axis=2).mean(axis=0)
                for i in range(3)
            ]
            biases.append(np.asarray(jnp.stack(qs, axis=-1)))  # (Kk, 3)
        self.biases = biases
        return self

    def __call__(self, x, normalize: bool = True):
        assert self.biases is not None, "call fit() first"
        xb = jnp.asarray(x)
        feats = []
        for di, out in enumerate(self._convs(xb)):
            bias = jnp.asarray(self.biases[di])  # (Kk, 3)
            ppv = (
                (out[:, :, None, :] - bias[None, :, :, None]) > 0
            ).astype(jnp.float32).mean(axis=-1)  # (B, Kk, 3)
            feats.append(ppv.reshape(xb.shape[0], -1))
        z = jnp.concatenate(feats, axis=-1)
        n = z.shape[-1]
        if n < self.num_features:  # zero-fill to the fixed width (reference)
            z = jnp.pad(z, ((0, 0), (0, self.num_features - n)))
        if normalize:
            z = z / jnp.maximum(
                jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12
            )
        return z
