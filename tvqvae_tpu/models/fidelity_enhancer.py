"""Fidelity enhancer: a 1-D U-Net refining sampled trajectories.

Reference: timevqvae/models/fidelity_enhancer.py (a denoising-diffusion-
style Unet1D used as a plain x->x refiner; its time-embedding MLP is built
but never used in forward — reference :339-344 vs :417-464 — so it is
deliberately omitted here). Architectural parity, channel-last layout:

  - weight-standardized k3 convs + GroupNorm + Snake blocks (:98-120,186-204)
  - ResnetBlocks with 1x1 skip projection (:207-231)
  - linear attention on the down path / full attention at the bottleneck,
    both behind channel-LayerNorm pre-norm residuals (:234-283)
  - stride-2 k4 downsamples, nearest-2x + k3 conv upsamples (:87-95)
  - linear-resize skip connections (lengths may mismatch after odd
    divisions; :443-455), residual concat of the stem features (:459-461),
    and a 1-3-3 replicate-padded output head (:399-415)
  - the enhancer first resizes its input to `input_length` (:484-497)

The SVQ temperature tau lives in the stage-3 train state (not a module
buffer); reference registers it on the module (:472) with default 0.0.
"""

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from tvqvae_tpu.ops.interp import interp_linear, interp_nearest
from .layers import Snake


class WSConv1d(nn.Module):
    """Weight-standardized 1-D conv (reference :98-120).

    `dtype` is the conv compute dtype (params stay fp32; weight
    standardization always in fp32). bf16 halves the stage-3 step's
    activation HBM traffic — the step is memory-bound at ~20 GB fp32
    (tools/roofline.py --stage 3)."""

    features: int
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, in_ch, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        # eps keyed on COMPUTE dtype (reference keys on half-vs-float)
        eps = 1e-5 if self.dtype == jnp.float32 else 1e-3
        mean = kernel.mean(axis=(0, 1), keepdims=True)
        var = kernel.var(axis=(0, 1), keepdims=True)
        w = (kernel - mean) * jax.lax.rsqrt(var + eps)
        pad = (self.kernel_size - 1) // 2
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=(1,), padding=[(pad, pad)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        return y + bias.astype(self.dtype)


class ChanLayerNorm(nn.Module):
    """Channel LayerNorm with scale only (reference :123-132). Statistics
    always in fp32; result in the input dtype."""

    @nn.compact
    def __call__(self, x):
        eps = 1e-5 if x.dtype == jnp.float32 else 1e-3
        g = self.param("g", nn.initializers.ones_init(), (x.shape[-1],))
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=-1, keepdims=True)
        var = xf.var(axis=-1, keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + eps) * g).astype(x.dtype)


class UnetBlock(nn.Module):
    """WSConv -> GroupNorm -> Snake -> Dropout (reference :186-204).
    Convs/Snake in `dtype`; GroupNorm statistics always fp32."""

    features: int
    groups: int = 8
    dropout: float = 0.0
    dtype: Any = jnp.float32
    fast_norm: bool = False  # GN normalization in compute dtype (stats fp32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = WSConv1d(self.features, dtype=self.dtype)(x)
        if self.fast_norm:
            from .layers import GroupNorm as FastGroupNorm

            x = FastGroupNorm(num_groups=self.groups, epsilon=1e-5)(x)
        else:
            # epsilon 1e-5 matches torch nn.GroupNorm (flax default 1e-6)
            x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5)(
                x.astype(jnp.float32)
            ).astype(self.dtype)
        x = Snake(self.features)(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class ResnetBlock1d(nn.Module):
    features: int
    groups: int = 8
    dropout: float = 0.0
    dtype: Any = jnp.float32
    fast_norm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = UnetBlock(self.features, self.groups, self.dropout,
                      dtype=self.dtype, fast_norm=self.fast_norm)(x, train)
        h = UnetBlock(self.features, self.groups, self.dropout,
                      dtype=self.dtype, fast_norm=self.fast_norm)(h, train)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1,), dtype=self.dtype)(x)
        return x.astype(self.dtype) + h


class LinearAttention1d(nn.Module):
    """Efficient linear attention (reference :234-258)."""

    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        inner = self.heads * self.dim_head
        qkv = nn.Conv(inner * 3, (1,), use_bias=False)(x)  # (B, N, 3*inner)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        shape = (B, N, self.heads, self.dim_head)
        q = q.reshape(shape).transpose(0, 2, 3, 1)  # (B, h, d, N)
        k = k.reshape(shape).transpose(0, 2, 3, 1)
        v = v.reshape(shape).transpose(0, 2, 3, 1)
        q = jax.nn.softmax(q, axis=-2) * (self.dim_head ** -0.5)
        k = jax.nn.softmax(k, axis=-1)
        context = jnp.einsum("bhdn,bhen->bhde", k, v)
        out = jnp.einsum("bhde,bhdn->bhen", context, q)  # (B, h, e, N)
        out = out.transpose(0, 3, 1, 2).reshape(B, N, inner)
        out = nn.Conv(C, (1,))(out)
        return ChanLayerNorm()(out)


class Attention1d(nn.Module):
    """Full softmax attention at the bottleneck (reference :261-283)."""

    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        inner = self.heads * self.dim_head
        qkv = nn.Conv(inner * 3, (1,), use_bias=False)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        shape = (B, N, self.heads, self.dim_head)
        q = q.reshape(shape) * (self.dim_head ** -0.5)
        k = k.reshape(shape)
        v = v.reshape(shape)
        sim = jnp.einsum("bihd,bjhd->bhij", q, k)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(B, N, inner)
        return nn.Conv(C, (1,))(out)


class _PreNormResidual(nn.Module):
    """Pre-norm residual around an attention module. The attention inner
    runs fp32 regardless of stream dtype (its params are fp32 and flax
    promotes; traffic there is negligible — attention acts on the
    downsampled N=~580 maps); the residual add stays in the stream dtype."""

    inner: nn.Module

    @nn.compact
    def __call__(self, x):
        return x + self.inner(ChanLayerNorm()(x)).astype(x.dtype)


class Unet1D(nn.Module):
    dim: int
    channels: int
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    resnet_block_groups: int = 8
    dropout: float = 0.0
    dtype: Any = jnp.float32  # stream compute dtype (params/norm stats fp32)
    fast_norm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, L, C) channel-last; returns (B, L, channels) fp32."""
        g, p, dt = self.resnet_block_groups, self.dropout, self.dtype
        dims = [self.dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))

        x = nn.Conv(self.dim, (7,), padding=[(3, 3)], dtype=dt)(x)
        r = x
        skips = []

        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= len(in_out) - 1
            x = ResnetBlock1d(dim_in, g, p, dtype=dt, fast_norm=self.fast_norm)(x, train)
            skips.append(x)
            x = ResnetBlock1d(dim_in, g, p, dtype=dt, fast_norm=self.fast_norm)(x, train)
            x = _PreNormResidual(LinearAttention1d())(x)
            skips.append(x)
            if not is_last:
                x = nn.Conv(dim_out, (4,), strides=(2,), padding=[(1, 1)],
                            dtype=dt)(x)
            else:
                x = nn.Conv(dim_out, (3,), padding=[(1, 1)], dtype=dt)(x)

        mid = dims[-1]
        x = ResnetBlock1d(mid, g, p, dtype=dt, fast_norm=self.fast_norm)(x, train)
        x = _PreNormResidual(Attention1d())(x)
        x = ResnetBlock1d(mid, g, p, dtype=dt, fast_norm=self.fast_norm)(x, train)

        def resize_cat(x, skip):
            skip = jnp.swapaxes(
                interp_linear(jnp.swapaxes(skip, 1, 2), x.shape[1]), 1, 2
            )
            return jnp.concatenate([x, skip], axis=-1)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind == len(in_out) - 1
            x = resize_cat(x, skips.pop())
            x = ResnetBlock1d(dim_out, g, p, dtype=dt, fast_norm=self.fast_norm)(x, train)
            x = resize_cat(x, skips.pop())
            x = ResnetBlock1d(dim_out, g, p, dtype=dt, fast_norm=self.fast_norm)(x, train)
            x = _PreNormResidual(LinearAttention1d())(x)
            if not is_last:
                # nearest-2x + k3 conv upsample
                x = jnp.swapaxes(
                    interp_nearest(jnp.swapaxes(x, 1, 2), x.shape[1] * 2), 1, 2
                )
                x = nn.Conv(dim_in, (3,), padding=[(1, 1)], dtype=dt)(x)
            else:
                x = nn.Conv(dim_in, (3,), padding=[(1, 1)], dtype=dt)(x)

        # last_up (reference :392,458)
        x = jnp.swapaxes(
            interp_nearest(jnp.swapaxes(x, 1, 2), x.shape[1] * 2), 1, 2
        )
        x = nn.Conv(dims[0], (3,), padding=[(1, 1)], dtype=dt)(x)
        # resize back to stem length + residual concat (reference :459-461)
        x = jnp.swapaxes(
            interp_linear(jnp.swapaxes(x, 1, 2), r.shape[1]), 1, 2
        )
        x = jnp.concatenate([x, r], axis=-1)
        x = ResnetBlock1d(self.dim, g, p, dtype=dt, fast_norm=self.fast_norm)(x, train)

        # output head: k1 conv then two k3 replicate-padded convs (:399-415)
        # — always fp32 (the head writes the final C=4 trajectory)
        x = nn.Conv(self.channels, (1,))(x.astype(jnp.float32))
        for _ in range(2):
            xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)), mode="edge")
            x = nn.Conv(self.channels, (3,), padding="VALID")(xp)
        return x


class FidelityEnhancer(nn.Module):
    """Resize to input_length then refine with the U-Net (reference :467-497).
    Channel-first (B, C, L) boundary like the rest of the models."""

    input_length: int
    in_channels: int
    dim: int = 8
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    resnet_block_groups: int = 4
    dropout: float = 0.5
    # U-Net stream compute dtype ("float32" | "bfloat16"); params, norm
    # statistics, attention, and the output head stay fp32. bf16 halves
    # the stage-3 step's ~20 GB activation traffic (memory-bound,
    # tools/roofline.py --stage 3).
    compute_dtype: str = "float32"
    # GroupNorm normalization in compute_dtype (fp32-accumulated stats) —
    # the stage-3 analogue of the stage-1 fast_bn lever.
    fast_norm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = interp_linear(x, self.input_length)  # (B, C, L)
        x = jnp.swapaxes(x, 1, 2)  # (B, L, C)
        x = Unet1D(
            dim=self.dim,
            channels=self.in_channels,
            dim_mults=tuple(self.dim_mults),
            resnet_block_groups=self.resnet_block_groups,
            dropout=self.dropout,
            dtype=jnp.dtype(self.compute_dtype),
            fast_norm=self.fast_norm,
        )(x, train)
        return jnp.swapaxes(x, 1, 2).astype(jnp.float32)  # (B, C, L)
