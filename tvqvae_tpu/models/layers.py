"""Shared flax building blocks.

All conv stacks run channel-last (NHWC / NLC) — the TPU-preferred layout —
while the public model APIs keep the reference's channel-first convention at
the boundary. Torch-geometry parity notes:

  - `ConvTranspose2dTorch` reproduces torch's ConvTranspose2d output-size
    arithmetic (out = (in-1)*stride - 2*pad + kernel) via an input-dilated
    conv, which the reference decoder relies on for its width doubling
    (timevqvae/models/vq_vae.py:95-121,238-251).
  - `Snake` is the learnable per-channel x + (1/a) sin^2(ax) activation
    (reference train_utils.py:421-448, a ~ U(0.2, 0.5)).
  - BatchNorm matches torch defaults (momentum 0.1 torch == 0.9 flax,
    eps 1e-5), with running stats in the `batch_stats` collection.
"""

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tvqvae_tpu.ops.snake import snake


def snake_init(a_base: float = 0.2, a_max: float = 0.5):
    def init(rng, shape, dtype=jnp.float32):
        return jax.random.uniform(rng, shape, dtype, a_base, a_max)

    return init


class Snake(nn.Module):
    """Learnable per-channel snake activation over channel-last inputs."""

    features: int

    @nn.compact
    def __call__(self, x):
        a = self.param("a", snake_init(), (self.features,))
        return snake(x, a.astype(x.dtype))


class ConvTranspose2dTorch(nn.Module):
    """Transposed 2-D conv with torch output-size semantics, NHWC layout."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Tuple[int, int]  # torch-style symmetric padding
    dtype: Any = jnp.float32  # compute dtype (params stay fp32)

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        ph, pw = self.padding
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, in_ch, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding=[(kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)],
            lhs_dilation=self.strides,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias.astype(self.dtype)


class BatchNorm(nn.Module):
    """BatchNorm with fp32-accumulated statistics and normalization
    arithmetic in the INPUT dtype — no fp32 materialization of activations.

    Why: flax's nn.BatchNorm promotes activations to fp32, so under bf16
    compute every BN materializes a full fp32 copy of a (B, 3, 4634, C)
    activation (~228 MB at C=128) — the roofline's multiply_add fusions,
    ~3.4 GB/step of pure conversion traffic on the memory-bound stage-1
    step (PERF.md). This version computes mean / E[x^2] with fp32
    accumulators directly over the bf16 input (XLA fuses the converts into
    the reduces) and folds (scale, bias, mean, var) into a per-channel
    y = x*w + b evaluated in the input dtype.

    Tree-compatible with flax nn.BatchNorm: the class is deliberately NAMED
    "BatchNorm" so flax auto-naming yields the same "BatchNorm_N" paths, with
    the same scale/bias params and batch_stats mean/var leaves (all fp32) and
    the same EMA update rule (biased variance, flax momentum convention), so
    checkpoints swap freely between the two implementations
    (tests/test_fast_bn.py).
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (feat,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (feat,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            red = tuple(range(x.ndim - 1))
            # fp32-accumulated reduces over the (possibly bf16) input; the
            # astype fuses into the reduce inputs, nothing fp32 is stored
            mean = jnp.mean(x.astype(jnp.float32), axis=red)
            mean2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=red)
            var = mean2 - jnp.square(mean)  # flax's biased E[x^2]-E[x]^2
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)
        w = scale * jax.lax.rsqrt(var + self.epsilon)  # fp32, per-channel
        b = bias - mean * w
        return x * w.astype(x.dtype) + b.astype(x.dtype)


class GroupNorm(nn.Module):
    """GroupNorm with fp32-accumulated statistics and normalization
    arithmetic in the INPUT dtype — the GroupNorm analogue of the fast
    BatchNorm above (flax nn.GroupNorm would promote the activation to
    fp32; the stage-3 U-Net wraps every conv in one). Tree-compatible with
    flax nn.GroupNorm (class name kept "GroupNorm" -> same "GroupNorm_N"
    paths, same scale/bias leaves, biased variance)."""

    num_groups: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        g = self.num_groups
        cg = feat // g
        scale = self.param("scale", nn.initializers.ones_init(), (feat,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (feat,),
                          jnp.float32)
        B = x.shape[0]
        xg = x.reshape(B, -1, g, cg)
        mean = jnp.mean(xg.astype(jnp.float32), axis=(1, 3))      # (B, g)
        mean2 = jnp.mean(jnp.square(xg.astype(jnp.float32)), axis=(1, 3))
        var = mean2 - jnp.square(mean)
        inv = jax.lax.rsqrt(var + self.epsilon)                   # (B, g)
        w = jnp.repeat(inv, cg, axis=1) * scale[None, :]          # (B, feat)
        b = bias[None, :] - jnp.repeat(mean, cg, axis=1) * w
        shape = (B,) + (1,) * (x.ndim - 2) + (feat,)
        return (x * w.reshape(shape).astype(x.dtype)
                + b.reshape(shape).astype(x.dtype))


def batch_norm(train: bool, fast: bool = False) -> nn.Module:
    """`fast=True` selects the traffic-lean BatchNorm above (normalization in
    the input dtype); default is flax's fp32-promoting implementation, kept
    as the parity-pinned legacy path."""
    if fast:
        return BatchNorm(use_running_average=not train)
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)


class ResBlock2d(nn.Module):
    """Snake -> conv -> BN -> Snake -> conv -> dropout, + 1x1-projected skip.

    Reference vq_vae.py:13-62; kernel (1,3) when frequency-independent else
    (3,3), 'same' padding.
    """

    out_channels: int
    frequency_independence: bool
    dropout: float = 0.0
    dtype: Any = jnp.float32
    fast_bn: bool = False  # normalize in compute dtype (stats stay fp32)

    @nn.compact
    def __call__(self, x, train: bool):
        in_ch = x.shape[-1]
        ksize = (1, 3) if self.frequency_independence else (3, 3)
        pad = (0, 1) if self.frequency_independence else (1, 1)

        x = x.astype(self.dtype)
        h = Snake(in_ch)(x)
        h = nn.Conv(self.out_channels, ksize, dtype=self.dtype,
                    padding=[(pad[0], pad[0]), (pad[1], pad[1])])(h)
        if self.fast_bn:
            h = batch_norm(train, fast=True)(h)
        else:
            # BatchNorm statistics in fp32 regardless of compute dtype
            h = batch_norm(train)(h.astype(jnp.float32)).astype(self.dtype)
        h = Snake(self.out_channels)(h)
        h = nn.Conv(self.out_channels, ksize, dtype=self.dtype,
                    padding=[(pad[0], pad[0]), (pad[1], pad[1])])(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)

        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(x)
        return x + h


class EncBlock2d(nn.Module):
    """Width-halving encoder block: replicate-padded strided conv -> BN ->
    Snake (reference vq_vae.py:65-92; kernel (3,4)/(1,4), stride (1,2))."""

    out_channels: int
    frequency_independence: bool
    dropout: float = 0.0
    dtype: Any = jnp.float32
    fast_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        ksize = (1, 4) if self.frequency_independence else (3, 4)
        pad = (0, 1) if self.frequency_independence else (1, 1)
        # replicate ("edge") padding, then VALID conv
        x = jnp.pad(
            x.astype(self.dtype),
            ((0, 0), (pad[0], pad[0]), (pad[1], pad[1]), (0, 0)), mode="edge"
        )
        x = nn.Conv(self.out_channels, ksize, strides=(1, 2), padding="VALID",
                    dtype=self.dtype)(x)
        if self.fast_bn:
            x = batch_norm(train, fast=True)(x)
        else:
            x = batch_norm(train)(x.astype(jnp.float32)).astype(self.dtype)
        x = Snake(self.out_channels)(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class DecBlock2d(nn.Module):
    """Width-doubling decoder block: transposed conv -> BN -> Snake
    (reference vq_vae.py:95-121)."""

    out_channels: int
    frequency_independence: bool
    dropout: float = 0.0
    dtype: Any = jnp.float32
    fast_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        ksize = (1, 4) if self.frequency_independence else (3, 4)
        pad = (0, 1) if self.frequency_independence else (1, 1)
        x = ConvTranspose2dTorch(self.out_channels, ksize, (1, 2), pad,
                                 dtype=self.dtype)(x)
        if self.fast_bn:
            x = batch_norm(train, fast=True)(x)
        else:
            x = batch_norm(train)(x.astype(jnp.float32)).astype(self.dtype)
        x = Snake(self.out_channels)(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x
