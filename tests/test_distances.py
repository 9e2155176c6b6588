"""Trajectory-distance kernels vs naive transcriptions of the reference
recurrences (traj-dist semantics, including its border quirks)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tvqvae_tpu.evaluation.flyability.distances import (
    R_SPHERICAL,
    calculate_trajectory_distances,
    discret_frechet,
    dtw,
    edr,
    erp,
    frechet,
    hausdorff,
    lcss,
    sspd,
)


def _eucl(a, b):
    return float(np.linalg.norm(np.asarray(a) - np.asarray(b)))


def _gc_m(a, b):
    lat1, lon1, lat2, lon2 = map(np.radians, (a[0], a[1], b[0], b[1]))
    s = (
        np.sin((lat2 - lat1) / 2) ** 2
        + np.cos(lat1) * np.cos(lat2) * np.sin((lon2 - lon1) / 2) ** 2
    )
    return R_SPHERICAL * 2 * np.arcsin(np.sqrt(min(s, 1.0)))


def _dist(metric):
    return _eucl if metric == "euclidean" else _gc_m


def naive_dtw(p, q, metric):
    d = _dist(metric)
    n, m = len(p), len(q)
    C = np.full((n + 1, m + 1), np.inf)
    C[0, 0] = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            C[i, j] = d(p[i - 1], q[j - 1]) + min(
                C[i, j - 1], C[i - 1, j - 1], C[i - 1, j]
            )
    return C[n, m]


def naive_erp(p, q, g, metric):
    d = _dist(metric)
    n, m = len(p), len(q)
    gp = [d(g, x) for x in p]
    gq = [d(g, y) for y in q]
    C = np.zeros((n + 1, m + 1))
    C[1:, 0] = sum(gp)  # traj-dist quirk: full-sum borders
    C[0, 1:] = sum(gq)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            C[i, j] = min(
                C[i - 1, j] + gp[i - 1],
                C[i, j - 1] + gq[j - 1],
                C[i - 1, j - 1] + d(p[i - 1], q[j - 1]),
            )
    return C[n, m]


def naive_edr(p, q, eps, metric):
    d = _dist(metric)
    n, m = len(p), len(q)
    C = np.zeros((n + 1, m + 1))  # zero borders (traj-dist)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            sub = 0 if d(p[i - 1], q[j - 1]) < eps else 1
            C[i, j] = min(C[i, j - 1] + 1, C[i - 1, j] + 1, C[i - 1, j - 1] + sub)
    return C[n, m] / max(n, m)


def naive_lcss(p, q, eps, metric):
    d = _dist(metric)
    n, m = len(p), len(q)
    C = np.zeros((n + 1, m + 1))
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            if d(p[i - 1], q[j - 1]) < eps:
                C[i, j] = C[i - 1, j - 1] + 1
            else:
                C[i, j] = max(C[i, j - 1], C[i - 1, j])
    return 1 - C[n, m] / min(n, m)


def naive_discret_frechet(p, q, metric):
    d = _dist(metric)
    n, m = len(p), len(q)
    C = np.zeros((n, m))
    for i in range(n):
        for j in range(m):
            dd = d(p[i], q[j])
            if i == 0 and j == 0:
                C[i, j] = dd
            elif i == 0:
                C[i, j] = max(dd, C[i, j - 1])
            elif j == 0:
                C[i, j] = max(dd, C[i - 1, j])
            else:
                C[i, j] = max(dd, min(C[i - 1, j], C[i - 1, j - 1], C[i, j - 1]))
    return C[n - 1, m - 1]


@pytest.fixture(params=[0, 1, 2])
def pair(request):
    rng = np.random.default_rng(request.param)
    n, m = [(12, 15), (20, 9), (7, 7)][request.param]
    p = np.cumsum(rng.normal(0, 0.05, (n, 2)), axis=0) + [48.0, 5.0]
    q = np.cumsum(rng.normal(0, 0.05, (m, 2)), axis=0) + [48.0, 5.0]
    return p.astype(np.float32), q.astype(np.float32)


@pytest.mark.parametrize("metric", ["euclidean", "spherical"])
def test_dtw_matches_naive(pair, metric):
    p, q = pair
    ours = float(dtw(jnp.asarray(p), jnp.asarray(q), metric=metric))
    ref = naive_dtw(p, q, metric)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


@pytest.mark.parametrize("metric", ["euclidean", "spherical"])
def test_erp_matches_naive(pair, metric):
    p, q = pair
    g = np.array([47.0, 4.0], np.float32)
    ours = float(erp(jnp.asarray(p), jnp.asarray(q), jnp.asarray(g), metric=metric))
    ref = naive_erp(p, q, g, metric)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


@pytest.mark.parametrize("metric,eps", [("euclidean", 0.05), ("spherical", 5000.0)])
def test_edr_matches_naive(pair, metric, eps):
    p, q = pair
    ours = float(edr(jnp.asarray(p), jnp.asarray(q), eps, metric=metric))
    ref = naive_edr(p, q, eps, metric)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


@pytest.mark.parametrize("metric,eps", [("euclidean", 0.05), ("spherical", 5000.0)])
def test_lcss_matches_naive(pair, metric, eps):
    p, q = pair
    ours = float(lcss(jnp.asarray(p), jnp.asarray(q), eps, metric=metric))
    ref = naive_lcss(p, q, eps, metric)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


@pytest.mark.parametrize("metric", ["euclidean", "spherical"])
def test_discret_frechet_matches_naive(pair, metric):
    p, q = pair
    ours = float(discret_frechet(jnp.asarray(p), jnp.asarray(q), metric=metric))
    ref = naive_discret_frechet(p, q, metric)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_sspd_hausdorff_basic():
    # q = p shifted by 0.1 perpendicular to the track: all point-to-segment
    # distances are 0.1
    p = np.stack([np.linspace(0, 1, 20), np.zeros(20)], axis=1).astype(np.float32)
    q = p + np.array([0.0, 0.1], np.float32)
    assert abs(float(sspd(jnp.asarray(p), jnp.asarray(q))) - 0.1) < 1e-5
    assert abs(float(hausdorff(jnp.asarray(p), jnp.asarray(q))) - 0.1) < 1e-5
    # identical trajectories -> 0
    assert float(sspd(jnp.asarray(p), jnp.asarray(p))) < 1e-6
    assert float(hausdorff(jnp.asarray(p), jnp.asarray(p))) < 1e-6


def test_frechet_known_cases():
    # parallel segments distance d apart -> frechet = d
    p = np.array([[0, 0], [0, 10]], np.float64)
    q = np.array([[1, 0], [1, 10]], np.float64)
    np.testing.assert_allclose(frechet(p, q), 1.0, rtol=1e-4)

    # translated dense polyline -> frechet == translation norm
    t = np.linspace(0, 2 * np.pi, 60)
    a = np.stack([np.cos(t), np.sin(t)], axis=1)
    b = a + np.array([0.3, 0.4])
    np.testing.assert_allclose(frechet(a, b), 0.5, rtol=1e-3)

    # frechet <= discrete frechet, >= endpoint distances
    rng = np.random.default_rng(0)
    p = np.cumsum(rng.normal(0, 0.1, (25, 2)), axis=0)
    q = np.cumsum(rng.normal(0, 0.1, (18, 2)), axis=0)
    f = frechet(p, q)
    df = float(discret_frechet(jnp.asarray(p), jnp.asarray(q)))
    lo = max(np.linalg.norm(p[0] - q[0]), np.linalg.norm(p[-1] - q[-1]))
    assert lo - 1e-5 <= f <= df + 1e-5

    # zig-zag vs straight line: continuous < discrete strictly
    p = np.array([[0, 0], [5, 1], [10, 0]], np.float64)
    q = np.array([[0, 0.2], [10, 0.2]], np.float64)
    f = frechet(p, q)
    df = float(discret_frechet(jnp.asarray(p), jnp.asarray(q)))
    assert f <= df + 1e-6


def test_calculate_trajectory_distances_bundle():
    rng = np.random.default_rng(0)
    p = np.cumsum(rng.normal(0, 0.02, (30, 2)), axis=0) + [48.0, 5.0]
    q = p + rng.normal(0, 0.005, p.shape)
    out = calculate_trajectory_distances(p, q, adep_latlon=(48.0, 5.0))
    keys = {
        "SSPD Euclidean", "SSPD Spherical", "DTW Euclidean", "DTW Spherical",
        "Hausdorff Euclidean", "Hausdorff Spherical", "LCSS Euclidean",
        "LCSS Spherical", "ERP Euclidean", "ERP Spherical", "EDR Euclidean",
        "EDR Spherical", "Discrete Frechet", "Frechet",
    }
    assert set(out) == keys
    assert all(np.isfinite(v) for v in out.values())
    assert out["Frechet"] <= out["Discrete Frechet"] + 1e-5


def test_bucket_padding_invariance():
    """Padded trajectories + true lengths must reproduce unpadded values."""
    import jax.numpy as jnp
    from tvqvae_tpu.evaluation.flyability.distances import _bucket_pad, frechet_jax

    rng = np.random.default_rng(3)
    p = (np.cumsum(rng.normal(0, 0.05, (13, 2)), axis=0) + [48, 5]).astype(np.float32)
    q = (np.cumsum(rng.normal(0, 0.05, (21, 2)), axis=0) + [48, 5]).astype(np.float32)
    g = np.array([47.0, 4.0], np.float32)
    pp, qq = jnp.asarray(_bucket_pad(p)), jnp.asarray(_bucket_pad(q))
    assert pp.shape[0] == 32 and qq.shape[0] == 32
    n, m = len(p), len(q)

    for fn, args in [
        (dtw, ()), (erp, (jnp.asarray(g),)), (discret_frechet, ()),
        (sspd, ()), (hausdorff, ()),
    ]:
        a = float(fn(jnp.asarray(p), jnp.asarray(q), *args))
        b = float(fn(pp, qq, *args, n=n, m=m))
        np.testing.assert_allclose(a, b, rtol=1e-4), fn
    for fn, eps in [(lcss, 0.05), (edr, 0.05)]:
        a = float(fn(jnp.asarray(p), jnp.asarray(q), eps))
        b = float(fn(pp, qq, eps, n=n, m=m))
        np.testing.assert_allclose(a, b, rtol=1e-5)
    # repeated-endpoint padding exact for continuous Frechet
    a = float(frechet_jax(jnp.asarray(p), jnp.asarray(q)))
    b = float(frechet_jax(pp, qq))
    np.testing.assert_allclose(a, b, rtol=1e-4)


@pytest.mark.slow  # big compile (round-5 fast-tier budget)
def test_batched_scoring_matches_per_pair():
    from tvqvae_tpu.evaluation.flyability.distances import (
        calculate_trajectory_distances_batch,
    )

    rng = np.random.default_rng(5)
    gens, sims = [], []
    for n, m in [(14, 18), (25, 25), (40, 9), (14, 20)]:
        p = np.cumsum(rng.normal(0, 0.03, (n, 2)), axis=0) + [48, 5]
        q = np.cumsum(rng.normal(0, 0.03, (m, 2)), axis=0) + [48, 5]
        gens.append(p.astype(np.float32))
        sims.append(q.astype(np.float32))
    g = (48.0, 5.0)
    batch = calculate_trajectory_distances_batch(gens, sims, g)
    for i in range(len(gens)):
        single = calculate_trajectory_distances(gens[i], sims[i], g)
        for k, v in single.items():
            np.testing.assert_allclose(
                batch[k][i], v, rtol=2e-3, atol=1e-5,
                err_msg=f"{k} pair {i}",
            )
