from .stft import (
    hann_window,
    time_to_timefreq,
    timefreq_to_time,
    stft_num_frames,
    istft_length,
)
from .band import zero_pad_high_freq, zero_pad_low_freq
from .interp import interp_linear, interp_nearest
from .snake import snake
from .shapes import compute_downsample_rate, token_geometry

__all__ = [
    "hann_window",
    "time_to_timefreq",
    "timefreq_to_time",
    "stft_num_frames",
    "istft_length",
    "zero_pad_high_freq",
    "zero_pad_low_freq",
    "interp_linear",
    "interp_nearest",
    "snake",
    "compute_downsample_rate",
    "token_geometry",
]
