"""TSGBench statistical metrics (reference evaluation/stat_metrics.py).

MDD uses gaussian-KDE absolute differences on a 100-point grid (:5-26);
ACD compares mean autocorrelations of channel 0 (:29-42) — computed here
via FFT (mathematically identical to np.correlate 'full', O(L log L)
instead of O(L^2)); SD/KD compare global skewness/kurtosis (:45-60).
"""

import numpy as np
from scipy.stats import gaussian_kde, kurtosis, skew


def marginal_distribution_difference(real: np.ndarray, gen: np.ndarray) -> float:
    rv = np.asarray(real, np.float64).reshape(-1)
    gv = np.asarray(gen, np.float64).reshape(-1)
    real_kde = gaussian_kde(rv)
    gen_kde = gaussian_kde(gv)
    grid = np.linspace(min(rv.min(), gv.min()), max(rv.max(), gv.max()), 100)
    return float(np.mean(np.abs(real_kde(grid) - gen_kde(grid))))


def _autocorr_fft(x: np.ndarray) -> np.ndarray:
    """Positive-lag autocorrelation == np.correlate(x, x, 'full')[L-1:]."""
    L = x.shape[-1]
    n = 1 << (2 * L - 1).bit_length()
    f = np.fft.rfft(x, n=n, axis=-1)
    ac = np.fft.irfft(f * np.conj(f), n=n, axis=-1)[..., :L]
    return ac


def auto_correlation_difference(real: np.ndarray, gen: np.ndarray) -> float:
    """Channel-0-only, matching the reference (:36-38)."""
    r = _autocorr_fft(np.asarray(real, np.float64)[:, 0, :]).mean(axis=0)
    g = _autocorr_fft(np.asarray(gen, np.float64)[:, 0, :]).mean(axis=0)
    return float(np.mean(np.abs(r - g)))


def skewness_difference(real: np.ndarray, gen: np.ndarray) -> float:
    return float(
        np.abs(skew(np.asarray(real).reshape(-1)) - skew(np.asarray(gen).reshape(-1)))
    )


def kurtosis_difference(real: np.ndarray, gen: np.ndarray) -> float:
    return float(
        np.abs(
            kurtosis(np.asarray(real).reshape(-1))
            - kurtosis(np.asarray(gen).reshape(-1))
        )
    )
