"""FID / Inception-Score computation (reference evaluation/eval_utils.py).

Host-side numpy/scipy like the reference (the matrices are small relative
to device work and sqrtm has no good XLA story); inputs are feature arrays
already produced on TPU by the FCN/ROCKET extractors.
"""

from typing import Tuple

import numpy as np
from scipy.linalg import sqrtm
from sklearn.ensemble import IsolationForest


def calculate_inception_score(
    p_yx: np.ndarray, n_split: int = 10, shuffle: bool = True,
    eps: float = 1e-16, seed=None,
) -> Tuple[float, float]:
    """KL-based IS over softmax class posteriors (reference eval_utils.py:9-53;
    the 'Inception' net is the supervised FCN)."""
    p = np.asarray(p_yx, np.float64)
    if shuffle:
        np.random.RandomState(seed).shuffle(p)
    scores = []
    n_part = int(np.floor(p.shape[0] / n_split))
    for i in range(n_split):
        part = p[i * n_part:(i + 1) * n_part]
        p_y = part.mean(axis=0, keepdims=True)
        kl = part * (np.log(part + eps) - np.log(p_y + eps))
        scores.append(np.exp(kl.sum(axis=1).mean()))
    return float(np.mean(scores)), float(np.std(scores))


def calculate_fid(z1: np.ndarray, z2: np.ndarray) -> float:
    """Frechet distance between feature gaussians (reference :56-81),
    including the real-part correction for the matrix square root."""
    z1 = np.asarray(z1, np.float64)
    z2 = np.asarray(z2, np.float64)
    mu1, mu2 = z1.mean(axis=0), z2.mean(axis=0)
    s1 = np.cov(z1, rowvar=False)
    s2 = np.cov(z2, rowvar=False)
    ssdiff = float(((mu1 - mu2) ** 2).sum())
    covmean = sqrtm(s1.dot(s2))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return ssdiff + float(np.trace(s1 + s2 - 2.0 * covmean))


def remove_outliers(z: np.ndarray) -> np.ndarray:
    """IsolationForest inlier filter applied before FID
    (reference train_utils.py:486-493; metrics.py:175-178)."""
    iso = IsolationForest(max_samples=0.9, contamination=0.1, random_state=0)
    keep = iso.fit_predict(np.asarray(z)) == 1
    return np.asarray(z)[keep]
