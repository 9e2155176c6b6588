"""Evaluation-stack tests: ROCKET exactness vs the spec formula, FID/IS
against hand-computable cases, stat metrics vs scipy/naive references."""

import numpy as np
import pytest

from tvqvae_tpu.evaluation import (
    Metrics,
    MiniRocket,
    apply_kernels,
    calculate_fid,
    calculate_inception_score,
    generate_kernels,
    remove_outliers,
)
from tvqvae_tpu.evaluation.stat_metrics import (
    auto_correlation_difference,
    marginal_distribution_difference,
)


def _rocket_reference(x, k):
    """Direct numpy transcription of the ROCKET spec (PPV + max over a
    dilated, optionally padded sliding dot product)."""
    B, L = x.shape
    K = k.weights.shape[0]
    out = np.zeros((B, 2 * K))
    for b in range(B):
        for i in range(K):
            ln, d, p, bias = k.lengths[i], k.dilations[i], k.paddings[i], k.biases[i]
            w = k.weights[i, :ln]
            out_len = L + 2 * p - (ln - 1) * d
            ppv, mx = 0, -np.inf
            for start in range(-p, L + p - (ln - 1) * d):
                s = bias
                idx = start
                for j in range(ln):
                    if 0 <= idx < L:
                        s += w[j] * x[b, idx]
                    idx += d
                mx = max(mx, s)
                ppv += s > 0
            out[b, 2 * i] = ppv / out_len
            out[b, 2 * i + 1] = mx
    return out


def test_rocket_matches_spec_formula():
    rng = np.random.default_rng(0)
    L, B, K = 64, 3, 20
    x = rng.normal(size=(B, L))
    kernels = generate_kernels(L, num_kernels=K, seed=1)
    ours = apply_kernels(x, kernels)
    ref = _rocket_reference(x, kernels)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_rocket_batch_padding_consistency():
    rng = np.random.default_rng(1)
    L = 32
    x = rng.normal(size=(10, L))
    kernels = generate_kernels(L, num_kernels=8, seed=0)
    full = apply_kernels(x, kernels, batch=4)  # 4+4+2 with padded last batch
    one = apply_kernels(x, kernels, batch=16)
    np.testing.assert_allclose(full, one, rtol=1e-5, atol=1e-6)


def test_minirocket_features():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 2, 128)).astype(np.float32)
    mr = MiniRocket(128).fit(x)
    z = np.asarray(mr(x))
    assert z.shape == (4, 10000)
    np.testing.assert_allclose(
        np.linalg.norm(z, axis=-1), np.ones(4), atol=1e-4
    )
    # deterministic
    np.testing.assert_allclose(z, np.asarray(mr(x)), atol=1e-6)


def test_fid_identity_and_separation():
    rng = np.random.default_rng(0)
    z1 = rng.normal(size=(500, 16))
    assert calculate_fid(z1, z1) < 1e-8
    z2 = rng.normal(size=(500, 16)) + 5.0
    fid_far = calculate_fid(z1, z2)
    assert fid_far > 16 * 20  # mean shift alone contributes 16*25
    # known closed form for equal covs: ||mu1-mu2||^2
    z3 = z1 + 2.0
    np.testing.assert_allclose(calculate_fid(z1, z3), 16 * 4.0, rtol=0.05)


def test_fid_svd_matches_schur_full_rank():
    # full-rank covariances (n > D): the SVD trace identity and scipy's
    # Schur sqrtm are the same quantity — agreement to fp noise
    rng = np.random.default_rng(1)
    z1 = rng.normal(size=(500, 16))
    z2 = rng.normal(size=(400, 16)) * 1.3 + 0.7
    a = calculate_fid(z1, z2, method="schur")
    b = calculate_fid(z1, z2, method="svd")
    np.testing.assert_allclose(b, a, rtol=1e-10, atol=1e-10)
    assert calculate_fid(z1, z1, method="svd") < 1e-8


def test_fid_svd_exact_on_rank_deficient():
    # n < D (the published eval regime: 660/1024 samples, 2000 ROCKET dims):
    # the ground truth is sum sqrt(eig(S1 S2)) over the exactly-nonzero
    # spectrum; the SVD identity reproduces it, while Schur on the singular
    # product drifts by O(sqrt(eps)) per zero mode (documented in eval_utils)
    rng = np.random.default_rng(2)
    z1 = rng.normal(size=(40, 100))
    z2 = rng.normal(size=(30, 100)) * 1.1 + 0.2
    s1 = np.cov(z1, rowvar=False)
    s2 = np.cov(z2, rowvar=False)
    lam = np.linalg.eigvals(s1.dot(s2))
    lam = np.clip(lam.real, 0.0, None)
    tr_sqrt_true = np.sqrt(lam).sum()
    mu1, mu2 = z1.mean(0), z2.mean(0)
    want = float(((mu1 - mu2) ** 2).sum() + np.trace(s1 + s2)
                 - 2.0 * tr_sqrt_true)
    got = calculate_fid(z1, z2, method="svd")
    # the eigvals oracle itself carries O(sqrt(eps)) zero-mode noise, so the
    # tolerance is looser than the full-rank test's
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_fid_method_rejects_unknown():
    z = np.zeros((10, 4))
    with pytest.raises(ValueError):
        calculate_fid(z, z, method="cholesky")


def test_inception_score_bounds():
    # perfectly confident, uniform class usage -> IS == n_classes
    p = np.eye(4)[np.tile(np.arange(4), 25)]
    is_mean, is_std = calculate_inception_score(p, n_split=5, shuffle=False)
    np.testing.assert_allclose(is_mean, 4.0, rtol=1e-6)
    # uniform posteriors -> IS == 1
    p = np.full((100, 4), 0.25)
    is_mean, _ = calculate_inception_score(p, n_split=5)
    np.testing.assert_allclose(is_mean, 1.0, rtol=1e-6)


def test_remove_outliers_shrinks():
    rng = np.random.default_rng(0)
    z = rng.normal(size=(200, 8))
    kept = remove_outliers(z)
    assert 150 <= kept.shape[0] < 200  # contamination 0.1


def test_acd_fft_equals_naive():
    rng = np.random.default_rng(0)
    real = rng.normal(size=(5, 2, 50))
    gen = rng.normal(size=(6, 2, 50))

    def naive(a, b):
        def ac(x):
            r = np.correlate(x, x, mode="full")
            return r[r.size // 2:]
        ra = np.mean([ac(s[0]) for s in a], axis=0)
        rb = np.mean([ac(s[0]) for s in b], axis=0)
        return np.mean(np.abs(ra - rb))

    np.testing.assert_allclose(
        auto_correlation_difference(real, gen), naive(real, gen), rtol=1e-6
    )


def test_mdd_zero_for_same_data():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(10, 1, 50))
    assert marginal_distribution_difference(x, x) < 1e-12
    y = rng.normal(size=(10, 1, 50)) + 3.0
    assert marginal_distribution_difference(x, y) > 0.05


def test_metrics_engine_rocket():
    rng = np.random.default_rng(0)
    Xtr = rng.normal(size=(40, 2, 64)).astype(np.float32)
    Xte = rng.normal(size=(20, 2, 64)).astype(np.float32)
    m = Metrics(64, 2, 3, batch_size=16, X_train=Xtr, X_test=Xte,
                feature_extractor_type="rocket", rocket_num_kernels=50)
    assert m.z_train.shape == (40, 100)
    assert m.z_test.shape == (20, 100)
    # rows are L2-normalized (reference metrics.py:124)
    np.testing.assert_allclose(
        np.linalg.norm(m.z_train, axis=-1), np.ones(40), atol=1e-4
    )
    fid_self = m.fid_score(m.z_test, m.z_test)
    assert fid_self < 1e-8
    mdd, acd, sd, kd = m.stat_metrics(Xte, Xtr)
    assert all(np.isfinite([mdd, acd, sd, kd]))


def test_metrics_engine_fcn():
    import jax
    from tvqvae_tpu.models.fcn import FCN

    rng = np.random.default_rng(0)
    Xtr = rng.normal(size=(24, 2, 64)).astype(np.float32)
    Xte = rng.normal(size=(12, 2, 64)).astype(np.float32)
    fcn = FCN(n_classes=3)
    variables = fcn.init({"params": jax.random.key(0)}, Xtr[:2], False)
    m = Metrics(64, 2, 3, batch_size=8, X_train=Xtr, X_test=Xte,
                feature_extractor_type="supervised_fcn",
                fcn_variables=variables)
    assert m.z_train.shape == (24, 128)
    is_mean, is_std = m.inception_score(Xte)
    assert np.isfinite(is_mean) and np.isfinite(is_std)
