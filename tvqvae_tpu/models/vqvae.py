"""Time-frequency VQ-VAE encoder / decoder conv stacks.

Reference: timevqvae/models/vq_vae.py:124-264. Architectural parity with a
TPU-first organization:

  - The STFT / band-copy preprocessing lives OUTSIDE the modules (in the
    stage-1 forward, tvqvae_tpu/train/stage1.py) rather than inside
    Encoder.forward (reference vq_vae.py:174-188) — the encoder/decoder are
    pure conv stacks over channel-last (NHWC) maps, so XLA fuses STFT conv,
    band copy and the first encoder conv into one kernel cluster.
  - Token geometry is derived statically (ops/shapes.py) instead of being
    discovered at runtime and stashed in buffers (vq_vae.py:169-187).
  - Channel schedule per the reference: encoder init_dim doubling each of
    `num_halvings` width-halvings, ending in a ResBlock to hid_dim;
    decoder mirrors it and appends two extra transposed convs, so its
    output width is W' * 2^(num_halvings+1) (vq_vae.py:238-251) — the
    surplus is resolved by iSTFT + linear resize + residual Linear head,
    applied by the caller via `TimeHead`.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvTranspose2dTorch, DecBlock2d, EncBlock2d, ResBlock2d


class _BlockFactory:
    """Builds blocks, optionally wrapped in flax's lifted jax.checkpoint.

    Rematerialization is a TRAINING-throughput lever on a memory-bound step:
    the stage-1 conv stacks are HBM-bandwidth-bound at the published shapes
    (PERF.md roofline — activations are (B, 3, 4634, C) maps), so NOT saving
    block-internal activations for the backward pass trades cheap recompute
    FLOPs (MFU is ~9%) for saved HBM writes+reads. `train` (argnum 2, after
    self and x) is a static python bool.

    nn.remat renames the wrapped class (Checkpoint<Block>), which would move
    params to different tree paths — so blocks always get an EXPLICIT name
    reproducing flax's auto-numbering, keeping checkpoints byte-identical
    between the two modes (tests/test_remat.py).
    """

    def __init__(self, remat: bool):
        self.remat = remat
        self.counts = {}

    def __call__(self, cls, *args, **kw):
        n = self.counts.get(cls.__name__, 0)
        self.counts[cls.__name__] = n + 1
        wrapped = nn.remat(cls, static_argnums=(2,)) if self.remat else cls
        return wrapped(*args, name=f"{cls.__name__}_{n}", **kw)


class VQVAEEncoder(nn.Module):
    """(B, H, W, 2C) time-frequency map -> (B, H', W', hid_dim) latents."""

    init_dim: int
    hid_dim: int
    num_halvings: int
    n_resnet_blocks: int
    frequency_independence: bool = False
    dropout: float = 0.3
    dtype: Any = jnp.float32  # compute dtype for the conv stack (params fp32)
    remat: bool = False  # checkpoint each block (recompute in backward)
    fast_bn: bool = False  # BN normalization in compute dtype (stats fp32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        mk = _BlockFactory(self.remat)
        d = self.init_dim
        x = mk(EncBlock2d, d, self.frequency_independence,
               dtype=self.dtype, fast_bn=self.fast_bn)(x, train)
        d *= 2
        for _ in range(self.num_halvings - 1):
            x = mk(EncBlock2d, d, self.frequency_independence,
                   dtype=self.dtype, fast_bn=self.fast_bn)(x, train)
            for _ in range(self.n_resnet_blocks):
                x = mk(
                    ResBlock2d, d, self.frequency_independence,
                    dropout=self.dropout, dtype=self.dtype,
                    fast_bn=self.fast_bn,
                )(x, train)
            d *= 2
        x = mk(
            ResBlock2d, self.hid_dim, self.frequency_independence,
            dropout=self.dropout, dtype=self.dtype, fast_bn=self.fast_bn,
        )(x, train)
        return x.astype(jnp.float32)  # VQ distances always fp32


class VQVAEDecoder(nn.Module):
    """(B, H', W', hid_dim) latents -> (B, H, W'', 2C) time-frequency map,
    W'' = W' * 2^(num_halvings + 1)."""

    init_dim: int
    hid_dim: int
    out_channels: int  # 2C spectral channels
    num_halvings: int
    n_resnet_blocks: int
    frequency_independence: bool = False
    dropout: float = 0.3
    dtype: Any = jnp.float32
    remat: bool = False  # checkpoint each block (recompute in backward)
    fast_bn: bool = False  # BN normalization in compute dtype (stats fp32)

    @nn.compact
    def __call__(self, z, train: bool = False):
        mk = _BlockFactory(self.remat)
        k = self.num_halvings
        d = self.init_dim * 2 ** (k - 1) if k >= 1 else self.init_dim
        ksize = (1, 4) if self.frequency_independence else (3, 4)
        pad = (0, 1) if self.frequency_independence else (1, 1)

        x = mk(ResBlock2d, d, self.frequency_independence,
               dropout=self.dropout, dtype=self.dtype,
               fast_bn=self.fast_bn)(z, train)
        for _ in range(k - 1):
            for _ in range(self.n_resnet_blocks):
                x = mk(
                    ResBlock2d, d, self.frequency_independence,
                    dropout=self.dropout, dtype=self.dtype,
                    fast_bn=self.fast_bn,
                )(x, train)
            d //= 2
            x = mk(DecBlock2d, d, self.frequency_independence,
                   dtype=self.dtype, fast_bn=self.fast_bn)(x, train)
        x = ConvTranspose2dTorch(self.out_channels, ksize, (1, 2), pad,
                                 dtype=self.dtype)(x)
        x = ConvTranspose2dTorch(self.out_channels, ksize, (1, 2), pad,
                                 dtype=self.dtype)(x)
        return x.astype(jnp.float32)  # iSTFT + losses in fp32


class TimeHead(nn.Module):
    """Post-iSTFT head: linear resize to input_length plus a residual dense
    layer over time (reference vq_vae.py:254-263 `Upsample` + `Linear(L, L)`,
    out = out + linear(out)). The (L, L) dense is the decoder's single
    largest matmul — ideal MXU work.

    `dtype` is the matmul compute dtype (params stay fp32, residual add in
    fp32). At the published L=4633 the two (L, L) weights are the model's
    two largest parameters (21.5 M each); the round-5 per-fusion roofline
    showed their fp32 forward/backward matmuls + the backward weight-
    transpose copies among the top traffic entries, so bf16 compute here
    halves that slice (the bf16_head lever; quality-gated like bf16_mu)."""

    input_length: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, C, L') channel-first time series
        from tvqvae_tpu.ops.interp import interp_linear

        x = interp_linear(x, self.input_length)
        y = nn.Dense(self.input_length, dtype=self.dtype)(x)  # time axis
        return x + y.astype(jnp.float32)
