"""Static shape math for the VQ-VAE latent grid.

The reference discovers the encoder output geometry (H', W', num_tokens) by
running the encoder once and stashing the result in buffers
(timevqvae/models/vq_vae.py:169-187), which MaskGIT later reads
(models/maskgit.py:72-83). Under jit we need these statically; they follow in
closed form from (L, n_fft, downsampled_width):

  - W frames = L + 1 (hop = n_fft//4 = 1, centered), H = n_fft//2 + 1 bins.
  - each stride-(1,2) encoder block maps W -> floor(W/2), H -> H
    (kernel (3,4)/(1,4), padding (1,1)/(0,1)).
  - number of halvings k = round(log2(downsample_rate)),
    downsample_rate = round(L / (log2(n_fft)-1) / downsampled_width)
    (reference train_utils.py:413-418).

Verified against the reference geometry for the published EHAM->LIMC dataset
(L=4633: LF -> (3, 9), HF -> (3, 36)) in tests/test_ops.py.
"""

import math
from typing import NamedTuple

from .stft import stft_num_frames


def compute_downsample_rate(input_length: int, n_fft: int, downsampled_width: int) -> int:
    """Reference train_utils.py:413-418 (round uses banker's rounding there
    too, via Python round)."""
    if input_length < downsampled_width:
        return 1
    return round(input_length / (math.log2(n_fft) - 1) / downsampled_width)


class TokenGeometry(NamedTuple):
    h_prime: int
    w_prime: int
    num_tokens: int
    num_halvings: int
    downsample_rate: int
    w_frames: int  # STFT frames before downsampling


def token_geometry(input_length: int, n_fft: int, downsampled_width: int) -> TokenGeometry:
    """Closed-form encoder output geometry for a (·, C, input_length) input."""
    rate = compute_downsample_rate(input_length, n_fft, downsampled_width)
    k = int(round(math.log2(rate))) if rate > 1 else 0
    k = max(k, 1)  # the first VQVAEEncBlock always halves once
    w = stft_num_frames(input_length, n_fft)
    w_frames = w
    h = n_fft // 2 + 1
    for _ in range(k):
        w = w // 2
    return TokenGeometry(
        h_prime=h,
        w_prime=w,
        num_tokens=h * w,
        num_halvings=k,
        downsample_rate=rate,
        w_frames=w_frames,
    )
