"""Golden tests for the conv-formulated STFT/iSTFT against torch CPU.

The reference pipeline's spectral transform is torch.stft/istft
(timevqvae/utils/train_utils.py:293-321); ours must agree bit-for-bit in
semantics (normalization, centering, frame count, channel layout).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tvqvae_tpu.ops import (
    time_to_timefreq,
    timefreq_to_time,
    stft_num_frames,
    istft_length,
    zero_pad_high_freq,
    zero_pad_low_freq,
)


def _torch_stft(x: np.ndarray, n_fft: int) -> np.ndarray:
    """Reference layout: (B, C, L) -> (B, 2C, H, W) with (c z) interleave."""
    B, C, L = x.shape
    xt = torch.from_numpy(x.reshape(B * C, L)).float()
    out = torch.stft(
        xt, n_fft, normalized=True, return_complex=True,
        window=torch.hann_window(n_fft),
    )
    out = torch.view_as_real(out)  # (B*C, H, W, 2)
    H, W = out.shape[1], out.shape[2]
    out = out.reshape(B, C, H, W, 2).permute(0, 1, 4, 2, 3).reshape(B, 2 * C, H, W)
    return out.numpy()


def _torch_istft(xf: np.ndarray, n_fft: int, C: int) -> np.ndarray:
    B = xf.shape[0]
    H, W = xf.shape[2], xf.shape[3]
    z = torch.from_numpy(xf).float().reshape(B, C, 2, H, W).permute(0, 1, 3, 4, 2)
    z = z.reshape(B * C, H, W, 2).contiguous()
    z = torch.view_as_complex(z)
    y = torch.istft(z, n_fft, normalized=True, window=torch.hann_window(n_fft))
    return y.reshape(B, C, -1).numpy()


@pytest.mark.parametrize("L", [64, 127, 301])
@pytest.mark.parametrize("n_fft", [4, 8])
def test_stft_matches_torch(L, n_fft):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, L)).astype(np.float32)
    ours = np.asarray(time_to_timefreq(jnp.asarray(x), n_fft))
    ref = _torch_stft(x, n_fft)
    assert ours.shape == ref.shape
    assert ours.shape[3] == stft_num_frames(L, n_fft)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("L", [64, 127])
@pytest.mark.parametrize("n_fft", [4, 8])
def test_istft_matches_torch(L, n_fft):
    rng = np.random.default_rng(1)
    C = 2
    x = rng.normal(size=(2, C, L)).astype(np.float32)
    xf = _torch_stft(x, n_fft)
    # arbitrary (non-Hermitian-consistent) spectra must also round-trip the
    # same way torch handles them (band-split outputs are not valid spectra)
    xf_mangled = xf.copy()
    xf_mangled[:, :, 1:, :] = 0.0
    for spec in (xf, xf_mangled):
        ours = np.asarray(timefreq_to_time(jnp.asarray(spec), n_fft))
        ref = _torch_istft(spec, n_fft, C)
        assert ours.shape == ref.shape
        assert ours.shape[-1] == istft_length(spec.shape[-1], n_fft)
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_stft_istft_roundtrip():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 4, 200)).astype(np.float32)
    xf = time_to_timefreq(jnp.asarray(x), 4)
    y = np.asarray(timefreq_to_time(xf, 4))
    np.testing.assert_allclose(y, x, atol=1e-5)


def test_band_split_matches_reference_semantics():
    rng = np.random.default_rng(3)
    xf = jnp.asarray(rng.normal(size=(2, 8, 3, 10)).astype(np.float32))

    lf = np.asarray(zero_pad_high_freq(xf))
    assert np.all(lf[:, :, 1:, :] == 0)
    np.testing.assert_array_equal(lf[:, :, 0, :], np.asarray(xf)[:, :, 0, :])

    lf_copy = np.asarray(zero_pad_high_freq(xf, copy=True))
    for h in range(3):
        np.testing.assert_array_equal(lf_copy[:, :, h, :], np.asarray(xf)[:, :, 0, :])

    hf = np.asarray(zero_pad_low_freq(xf))
    assert np.all(hf[:, :, 0, :] == 0)
    np.testing.assert_array_equal(hf[:, :, 1:, :], np.asarray(xf)[:, :, 1:, :])

    hf_copy = np.asarray(zero_pad_low_freq(xf, copy=True))
    np.testing.assert_array_equal(hf_copy[:, :, 0, :], np.asarray(xf)[:, :, 1, :])
    np.testing.assert_array_equal(hf_copy[:, :, 1:, :], np.asarray(xf)[:, :, 1:, :])

    # LF target + HF target == original spectrum
    np.testing.assert_allclose(lf + hf, np.asarray(xf))
