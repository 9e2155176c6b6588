"""Short-time Fourier transform as fused convolutions.

TPU-native reformulation of the reference's ``torch.stft``/``torch.istft``
calls (reference: timevqvae/utils/train_utils.py:293-321). With the tiny
``n_fft`` used by TimeVQVAE (n_fft=4, hop = n_fft//4 = 1, periodic Hann
window, normalized, centered/reflect-padded, one-sided), an FFT per frame is
pure overhead: the whole analysis transform is a linear map from each length-4
window to 2*(n_fft//2+1) = 6 real channels. We therefore express

  - STFT  as a single ``lax.conv_general_dilated`` with a precomputed
    (2*nbins, 1, n_fft) kernel (windowed DFT basis, normalized), and
  - iSTFT as a single transposed convolution (overlap-add of the windowed
    inverse-DFT basis) followed by division by the window-square envelope.

Both map straight onto the MXU and fuse with the surrounding VQ-VAE conv
stacks under jit. Semantics (shapes, normalization, padding, frame count)
match torch.stft / torch.istft exactly and are golden-tested against torch
CPU in tests/test_stft.py.

Channel layout matches the reference convention: the (B, C, L) signal maps to
(B, 2C, H, W) where H = n_fft//2 + 1 frequency bins, W = L + 1 frames (for
hop=1), and channel index (c*2 + z) holds the (real, imag) interleaving of
input channel c (reference train_utils.py:306 ``(b c) n t z -> b (c z) n t``).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n_fft: int) -> np.ndarray:
    """Periodic Hann window, identical to torch.hann_window(n_fft)."""
    n = np.arange(n_fft)
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))


def stft_num_frames(length: int, n_fft: int) -> int:
    """Number of STFT frames for a centered transform with hop = n_fft//4."""
    hop = max(n_fft // 4, 1)
    padded = length + 2 * (n_fft // 2)
    return (padded - n_fft) // hop + 1


def istft_length(num_frames: int, n_fft: int) -> int:
    """Signal length returned by a centered iSTFT (torch default length)."""
    hop = max(n_fft // 4, 1)
    return (num_frames - 1) * hop


def _analysis_kernel(n_fft: int, norm: bool, dtype) -> np.ndarray:
    """(2*nbins, 1, n_fft) windowed-DFT analysis kernel.

    Row (2k + z) computes the z-th (0=real, 1=imag) component of onesided
    frequency bin k: X[k, t] = sum_n w[n] * x[t*hop + n] * exp(-2i pi k n / N).
    """
    nbins = n_fft // 2 + 1
    w = hann_window(n_fft)
    # torch.stft(normalized=True) scales by 1/sqrt(frame_length)
    scale = 1.0 / np.sqrt(n_fft) if norm else 1.0
    n = np.arange(n_fft)
    k = np.arange(nbins)
    ang = -2.0 * np.pi * k[:, None] * n[None, :] / n_fft
    re = w[None, :] * np.cos(ang) * scale
    im = w[None, :] * np.sin(ang) * scale
    kern = np.stack([re, im], axis=1).reshape(2 * nbins, 1, n_fft)
    return kern.astype(dtype)


def _synthesis_kernel(n_fft: int, norm: bool, dtype) -> np.ndarray:
    """(2*nbins, 1, n_fft) windowed inverse-DFT synthesis kernel.

    Channel (2k + z) holds the contribution of the z-th component of bin k to
    the windowed inverse frame: w[n]/N * a_k * {cos, -sin}(2 pi k n / N),
    where a_k = 1 for DC/Nyquist and 2 otherwise (Hermitian symmetry; the
    imaginary parts of DC and Nyquist bins do not contribute, matching
    irfft/torch.istft).
    """
    nbins = n_fft // 2 + 1
    w = hann_window(n_fft)
    denorm = np.sqrt(n_fft) if norm else 1.0
    n = np.arange(n_fft)
    kern = np.zeros((2 * nbins, 1, n_fft))
    for k in range(nbins):
        a_k = 1.0 if (k == 0 or (n_fft % 2 == 0 and k == nbins - 1)) else 2.0
        ang = 2.0 * np.pi * k * n / n_fft
        kern[2 * k, 0, :] = w * a_k * np.cos(ang) / n_fft * denorm
        if not (k == 0 or (n_fft % 2 == 0 and k == nbins - 1)):
            kern[2 * k + 1, 0, :] = -w * a_k * np.sin(ang) / n_fft * denorm
    return kern.astype(dtype)


@partial(jax.jit, static_argnames=("n_fft", "norm"))
def time_to_timefreq(x: jax.Array, n_fft: int, norm: bool = True) -> jax.Array:
    """(B, C, L) time series -> (B, 2C, H, W) time-frequency map.

    Equivalent of reference train_utils.py:293-307 (torch.stft with
    normalized=True, centered, reflect padding, periodic Hann, hop=n_fft//4),
    with the same (c z) channel interleaving.
    """
    B, C, L = x.shape
    hop = max(n_fft // 4, 1)
    pad = n_fft // 2
    nbins = n_fft // 2 + 1

    xf = x.reshape(B * C, 1, L)
    xf = jnp.pad(xf, ((0, 0), (0, 0), (pad, pad)), mode="reflect")
    kern = jnp.asarray(_analysis_kernel(n_fft, norm, x.dtype))
    out = jax.lax.conv_general_dilated(
        xf, kern, window_strides=(hop,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,  # exact fp32 DFT on TPU (not bf16)
    )  # (B*C, 2*nbins, W)
    W = out.shape[-1]
    out = out.reshape(B, C, nbins, 2, W)
    out = jnp.moveaxis(out, 3, 2).reshape(B, C * 2, nbins, W)
    return out


@partial(jax.jit, static_argnames=("n_fft", "norm"))
def timefreq_to_time(xf: jax.Array, n_fft: int, norm: bool = True) -> jax.Array:
    """(B, 2C, H, W) time-frequency map -> (B, C, L_out) time series.

    Equivalent of reference train_utils.py:310-321 (torch.istft): per-frame
    inverse DFT, synthesis windowing, overlap-add, division by the
    window-square envelope, and trimming of the center padding. For hop=1 the
    output length is W - 1.
    """
    B, C2, H, W = xf.shape
    C = C2 // 2
    hop = max(n_fft // 4, 1)
    pad = n_fft // 2
    nbins = n_fft // 2 + 1
    assert H == nbins, f"expected {nbins} frequency bins, got {H}"

    # (B, 2C, H, W) -> (B*C, 2*nbins, W) with (k z) channel order
    z = xf.reshape(B, C, 2, nbins, W)
    z = jnp.moveaxis(z, 2, 3).reshape(B * C, 2 * nbins, W)

    kern = jnp.asarray(_synthesis_kernel(n_fft, norm, xf.dtype))
    # Overlap-add as a transposed conv: lhs_dilation=hop, full padding.
    ola = jax.lax.conv_general_dilated(
        z, jnp.flip(kern, -1).transpose(1, 0, 2),
        window_strides=(1,), padding=[(n_fft - 1, n_fft - 1)],
        lhs_dilation=(hop,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )  # (B*C, 1, (W-1)*hop + n_fft)

    # Window-square envelope (same overlap-add with w^2 over ones).
    w = jnp.asarray(hann_window(n_fft), dtype=xf.dtype)
    ones = jnp.ones((1, 1, W), dtype=xf.dtype)
    wsq = (w ** 2).reshape(1, 1, n_fft)
    env = jax.lax.conv_general_dilated(
        ones, jnp.flip(wsq, -1),
        window_strides=(1,), padding=[(n_fft - 1, n_fft - 1)],
        lhs_dilation=(hop,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )  # (1, 1, same)

    L_out = (W - 1) * hop
    y = ola[:, 0, pad:pad + L_out] / env[:, 0, pad:pad + L_out]
    return y.reshape(B, C, L_out)
