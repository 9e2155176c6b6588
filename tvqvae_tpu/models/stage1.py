"""Stage-1 TimeVQVAE model: dual-band (LF/HF) spectral VQ-VAE.

Reference: timevqvae/trainers/stage1.py:16-168 (model assembly + forward).
The whole per-band pipeline

    STFT -> band copy -> encoder -> VQ -> decoder -> band zero -> iSTFT
         -> resize + residual dense head

is one jit-compiled function of (params, batch_stats, codebook states, x):
the STFT is a conv (ops/stft.py), the band ops are indexing, and XLA fuses
them with the encoder/decoder stacks. The VQ codebooks are explicit
functional state (models/vq.py) so their EMA update is part of the step's
returned state — under a sharded batch the EMA statistics all-reduce over
the data mesh axis automatically (SURVEY.md §5.8).
"""

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from tvqvae_tpu.config import Config
from tvqvae_tpu.models.vq import (
    CodebookState,
    VQOutput,
    VQParams,
    init_codebook,
    vq_forward,
)
from tvqvae_tpu.models.vqvae import TimeHead, VQVAEDecoder, VQVAEEncoder
from tvqvae_tpu.ops import (
    time_to_timefreq,
    timefreq_to_time,
    token_geometry,
    zero_pad_high_freq,
    zero_pad_low_freq,
)
from tvqvae_tpu.ops.interp import interp_linear


@dataclass(frozen=True)
class Stage1Spec:
    """Static shape/hyperparameter bundle derived from the config."""

    input_length: int
    in_channels: int
    n_fft: int
    init_dim: int
    hid_dim: int
    n_resnet_blocks_enc: int
    n_resnet_blocks_dec: int
    halvings_l: int
    halvings_h: int
    tokens_l: int
    tokens_h: int
    hw_l: tuple
    hw_h: tuple
    vq_l: VQParams
    vq_h: VQParams
    dropout_enc: float = 0.3
    dropout_dec: float = 0.3
    # conv-stack compute dtype ("float32" | "bfloat16"); params/BN stats/VQ/
    # losses stay fp32. bf16 halves activation HBM traffic on TPU.
    compute_dtype: str = "float32"
    # checkpoint (rematerialize) each conv block in backward: trades cheap
    # recompute FLOPs for saved activation HBM traffic on the memory-bound
    # stage-1 step (PERF.md roofline). Numerics pinned by tests/test_remat.py.
    remat: bool = False
    # BN normalization arithmetic in compute_dtype (fp32-accumulated stats):
    # removes the fp32 activation materialization around every BN under bf16
    # (tests/test_fast_bn.py pins equivalence).
    fast_bn: bool = False
    # TimeHead (L, L) dense matmul in compute_dtype (params/residual fp32):
    # the decoder's largest matmuls + their backward transpose copies sit in
    # the per-fusion traffic top-10 at L=4633 (round-5 roofline).
    bf16_head: bool = False
    # iSTFT (overlap-add synthesis) in the compute dtype on the DECODE path:
    # the generation roofline's top traffic block is the fp32 iSTFT frame
    # reshuffling (0.45-0.53 GB layout copies each at GB=256, 44% of the
    # sampler's bytes — PERF.md round-5 generation roofline). Halves that.
    # Decode-side only; the stage-1 loss targets stay fp32 either way.
    bf16_istft: bool = False

    @staticmethod
    def from_config(
        cfg: Config, input_length: int, in_channels: int,
        use_pallas: bool = False, compute_dtype: str = "float32",
        remat: bool = False, fast_bn: bool = False, bf16_head: bool = False,
        bf16_istft: bool = False,
    ) -> "Stage1Spec":
        g_l = token_geometry(
            input_length, cfg.vqvae.n_fft, cfg.encoder.downsampled_width["lf"]
        )
        g_h = token_geometry(
            input_length, cfg.vqvae.n_fft, cfg.encoder.downsampled_width["hf"]
        )
        mk_vq = lambda k: VQParams(
            codebook_size=cfg.vqvae.codebook_sizes[k],
            dim=cfg.encoder.hid_dim,
            decay=cfg.vqvae.decay,
            eps=cfg.vqvae.eps,
            commitment_weight=cfg.vqvae.commitment_weight,
            threshold_ema_dead_code=cfg.vqvae.threshold_ema_dead_code,
            kmeans_init=cfg.vqvae.kmeans_init,
            kmeans_iters=cfg.vqvae.kmeans_iters,
            use_pallas=use_pallas,
        )
        return Stage1Spec(
            input_length=input_length,
            in_channels=in_channels,
            n_fft=cfg.vqvae.n_fft,
            init_dim=cfg.encoder.init_dim,
            hid_dim=cfg.encoder.hid_dim,
            n_resnet_blocks_enc=cfg.encoder.n_resnet_blocks,
            n_resnet_blocks_dec=cfg.decoder.n_resnet_blocks,
            halvings_l=g_l.num_halvings,
            halvings_h=g_h.num_halvings,
            tokens_l=g_l.num_tokens,
            tokens_h=g_h.num_tokens,
            hw_l=(g_l.h_prime, g_l.w_prime),
            hw_h=(g_h.h_prime, g_h.w_prime),
            vq_l=mk_vq("lf"),
            vq_h=mk_vq("hf"),
            dropout_enc=cfg.encoder.dropout,
            dropout_dec=cfg.decoder.dropout,
            compute_dtype=compute_dtype,
            remat=remat,
            fast_bn=fast_bn,
            bf16_head=bf16_head,
            bf16_istft=bf16_istft,
        )


@struct.dataclass
class Stage1Output:
    x_l: jax.Array  # LF time-domain target
    x_h: jax.Array  # HF time-domain target
    xhat_l: jax.Array
    xhat_h: jax.Array
    vq_l: VQOutput
    vq_h: VQOutput


class Stage1Model(nn.Module):
    """Holds the four conv stacks + two time heads; VQ state passed in."""

    spec: Stage1Spec

    def setup(self):
        s = self.spec
        dt = jnp.dtype(s.compute_dtype)
        self.encoder_l = VQVAEEncoder(
            s.init_dim, s.hid_dim, s.halvings_l, s.n_resnet_blocks_enc,
            dropout=s.dropout_enc, dtype=dt, remat=s.remat,
            fast_bn=s.fast_bn,
        )
        self.encoder_h = VQVAEEncoder(
            s.init_dim, s.hid_dim, s.halvings_h, s.n_resnet_blocks_enc,
            dropout=s.dropout_enc, dtype=dt, remat=s.remat,
            fast_bn=s.fast_bn,
        )
        spectral_ch = 2 * s.in_channels
        self.decoder_l = VQVAEDecoder(
            s.init_dim, s.hid_dim, spectral_ch, s.halvings_l,
            s.n_resnet_blocks_dec, dropout=s.dropout_dec, dtype=dt,
            remat=s.remat, fast_bn=s.fast_bn,
        )
        self.decoder_h = VQVAEDecoder(
            s.init_dim, s.hid_dim, spectral_ch, s.halvings_h,
            s.n_resnet_blocks_dec, dropout=s.dropout_dec, dtype=dt,
            remat=s.remat, fast_bn=s.fast_bn,
        )
        head_dt = dt if s.bf16_head else jnp.float32
        self.head_l = TimeHead(s.input_length, dtype=head_dt)
        self.head_h = TimeHead(s.input_length, dtype=head_dt)

    # --- per-band pieces -------------------------------------------------

    def encode(self, x: jax.Array, band: str, train: bool = False) -> jax.Array:
        """(B, C, L) time series -> (B, N, D) latent tokens (channel-last)."""
        s = self.spec
        xf = time_to_timefreq(x, s.n_fft)  # (B, 2C, H, W)
        pad = zero_pad_high_freq if band == "lf" else zero_pad_low_freq
        xf = pad(xf, copy=True)
        xf = jnp.transpose(xf, (0, 2, 3, 1))  # NHWC
        enc = self.encoder_l if band == "lf" else self.encoder_h
        z = enc(xf, train)  # (B, H', W', D)
        B, H, W, D = z.shape
        return z.reshape(B, H * W, D)

    def decode(self, zq: jax.Array, band: str, train: bool = False) -> jax.Array:
        """(B, N, D) quantized tokens -> (B, C, input_length) time series."""
        s = self.spec
        H, W = s.hw_l if band == "lf" else s.hw_h
        B = zq.shape[0]
        z = zq.reshape(B, H, W, s.hid_dim)
        dec = self.decoder_l if band == "lf" else self.decoder_h
        head = self.head_l if band == "lf" else self.head_h
        u = dec(z, train)  # (B, H, W'', 2C)
        u = jnp.transpose(u, (0, 3, 1, 2))  # (B, 2C, H, W'')
        pad = zero_pad_high_freq if band == "lf" else zero_pad_low_freq
        u = pad(u)  # zero the other band of the decoder output
        if s.bf16_istft and s.compute_dtype != "float32":
            # bf16 overlap-add: the synthesis conv kernels/frames move in
            # bf16 (the sampler's top traffic block); TimeHead's residual
            # add re-promotes to fp32
            u = u.astype(jnp.dtype(s.compute_dtype))
        xt = timefreq_to_time(u, s.n_fft)  # (B, C, W''-1)
        return head(xt)

    # --- full forward ----------------------------------------------------

    def __call__(
        self,
        x: jax.Array,
        vq_state_l: CodebookState,
        vq_state_h: CodebookState,
        train: bool = False,
        svq_temp: Optional[float] = None,
        vq_rng: Optional[jax.Array] = None,
    ) -> Stage1Output:
        s = self.spec

        # time-domain per-band targets (reference stage1.py:100-113)
        xf = time_to_timefreq(x, s.n_fft)
        x_l = interp_linear(
            timefreq_to_time(zero_pad_high_freq(xf), s.n_fft), s.input_length
        )
        x_h = interp_linear(
            timefreq_to_time(zero_pad_low_freq(xf), s.n_fft), s.input_length
        )

        rngs = (None, None)
        if vq_rng is not None:
            rngs = tuple(jax.random.split(vq_rng))

        z_l = self.encode(x, "lf", train)
        out_l = vq_forward(
            vq_state_l, z_l, s.vq_l, train=train, svq_temp=svq_temp, rng=rngs[0]
        )
        xhat_l = self.decode(out_l.quantized, "lf", train)

        z_h = self.encode(x, "hf", train)
        out_h = vq_forward(
            vq_state_h, z_h, s.vq_h, train=train, svq_temp=svq_temp, rng=rngs[1]
        )
        xhat_h = self.decode(out_h.quantized, "hf", train)

        return Stage1Output(
            x_l=x_l, x_h=x_h, xhat_l=xhat_l, xhat_h=xhat_h,
            vq_l=out_l, vq_h=out_h,
        )


def init_stage1(
    rng: jax.Array, spec: Stage1Spec, example_batch: jax.Array
):
    """Returns (model, params, batch_stats, vq_state_l, vq_state_h)."""
    model = Stage1Model(spec)
    r_model, r_vql, r_vqh, r_drop = jax.random.split(rng, 4)
    vq_l = init_codebook(r_vql, spec.vq_l)
    vq_h = init_codebook(r_vqh, spec.vq_h)
    # ONE jitted (persistently cacheable) init program: eager flax init
    # dispatches hundreds of ops, each paying host->device RTT on
    # relay-backed environments — ~250 s/run at the published geometry,
    # every run. Jitted it compiles once, hits the compile cache on
    # later runs, and executes in seconds.
    variables = jax.jit(
        lambda rm, rd, x, vl, vh: model.init(
            {"params": rm, "dropout": rd}, x, vl, vh, False,
        )
    )(r_model, r_drop, example_batch, vq_l, vq_h)
    return model, variables["params"], variables.get("batch_stats", {}), vq_l, vq_h


def stage1_losses(out: Stage1Output):
    """MSE on LF time, L1 on HF time, plus both VQ commitment losses
    (reference stage1.py:129-135,170-177)."""
    recon_l = jnp.mean((out.x_l - out.xhat_l) ** 2)
    recon_h = jnp.mean(jnp.abs(out.x_h - out.xhat_h))
    total = recon_l + recon_h + out.vq_l.loss + out.vq_h.loss
    metrics = {
        "loss": total,
        "recons_loss.LF.time": recon_l,
        "recons_loss.HF.time": recon_h,
        "recons_loss.time": recon_l + recon_h,
        "commit_loss.LF": out.vq_l.commit_loss,
        "commit_loss.HF": out.vq_h.commit_loss,
        "perplexity.LF": out.vq_l.perplexity,
        "perplexity.HF": out.vq_h.perplexity,
    }
    return total, metrics
