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


def calculate_fid(z1: np.ndarray, z2: np.ndarray, method: str = "schur") -> float:
    """Frechet distance between feature gaussians (reference :56-81),
    including the real-part correction for the matrix square root.

    method="schur" reproduces the reference exactly: scipy.linalg.sqrtm
    (blocked Schur) on the dense S1@S2 product, then the real part of the
    trace. method="svd" computes the same quantity through the exact
    identity  tr sqrtm(S1 S2) = sum svdvals(X1c X2c^T) / sqrt((n1-1)(n2-1))
    (the nonzero eigenvalues of S1 S2 are the squared singular values of the
    scaled centered cross-product), which needs one (n1, n2) SVD instead of
    a (D, D) Schur decomposition — measured 29.4 s -> 0.61 s at the real
    eval shapes (n=1024/660, D=2000 ROCKET features) on this host.

    The two methods agree to ~1e-12 when the covariances are full rank
    (n > D). When n < D (the published eval regime), scipy's Schur factors
    a singular nonsymmetric product: its ~D-n numerically-zero eigenvalues
    come out as O(eps)-perturbed values whose square roots are O(sqrt(eps)),
    and the ones that land positive-real inflate the trace — so "schur"
    *understates* FID near the floor (observed: 1.15e-3 vs the exact
    1.49e-3 on near-identical rank-1023 inputs). "svd" excludes the exact
    zero modes by construction. "schur" stays the default because the
    reference's published numbers carry that bias; use "svd" where speed
    matters (val-time running metrics) or when exactness is preferred.
    """
    z1 = np.asarray(z1, np.float64)
    z2 = np.asarray(z2, np.float64)
    mu1, mu2 = z1.mean(axis=0), z2.mean(axis=0)
    ssdiff = float(((mu1 - mu2) ** 2).sum())
    if method == "svd":
        x1 = z1 - mu1
        x2 = z2 - mu2
        n1, n2 = z1.shape[0], z2.shape[0]
        tr_s1 = float((x1 * x1).sum()) / (n1 - 1)
        tr_s2 = float((x2 * x2).sum()) / (n2 - 1)
        c = x1.dot(x2.T) / np.sqrt((n1 - 1.0) * (n2 - 1.0))
        tr_sqrt = float(np.linalg.svd(c, compute_uv=False).sum())
        return ssdiff + tr_s1 + tr_s2 - 2.0 * tr_sqrt
    if method != "schur":
        raise ValueError(method)
    s1 = np.cov(z1, rowvar=False)
    s2 = np.cov(z2, rowvar=False)
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
