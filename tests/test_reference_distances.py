"""Differential parity: the 14 flyability trajectory distances vs the
REFERENCE'S OWN vendored traj-dist code.

Loads /root/reference/.../trajectory_distances/ directly as a synthetic
package (the modules are pure numpy/scipy; the parent package __init__ pulls
in `traffic`, so we bypass it) and asserts this repo's jitted kernels
(tvqvae_tpu/evaluation/flyability/distances.py) agree on identical inputs.

Complements tests/test_distances.py (which checks against naive
transcriptions) with the reference's actual code as the oracle — closing the
"self-referential tests" gap flagged in VERDICT.md (Missing #3).

Column conventions: this repo takes (lat, lon) trajectories for spherical
metrics; the reference's vendored code reads column 0 as LONGITUDE
(sspd.py:152-156 `lats0 = t0[:, 1]; lons0 = t0[:, 0]`). The test feeds each
implementation its own declared order so both compute great-circle distances
over the SAME geographic points (see distances.py docstring, deviation D1).
"""

import importlib
import os
import sys
import types

import numpy as np
import pytest

from tvqvae_tpu.evaluation.flyability import distances as D

REF_DIST_DIR = (
    "/root/reference/timevqvae/evaluation/flyability_utils/trajectory_distances"
)

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(REF_DIST_DIR), reason="reference snapshot not present"
    ),
]


@pytest.fixture(scope="module")
def ref():
    """The reference's trajectory_distances modules as a synthetic package."""
    pkg_name = "_refdist_pkg"
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [REF_DIST_DIR]
        sys.modules[pkg_name] = pkg
    mods = {}
    for name in (
        "dtw",
        "sspd",
        "hausdorff",
        "lcss",
        "erp",
        "edr",
        "frechet",
        "discret_frechet",
    ):
        mods[name] = importlib.import_module(f"{pkg_name}.{name}")
    return types.SimpleNamespace(**mods)


def _traj_pair(seed, n, m, scale=1.0):
    """Two trajectories in a realistic European lat/lon box, (lat, lon)."""
    rng = np.random.RandomState(seed)
    base = np.array([48.0, 6.0])
    p = base + np.cumsum(rng.randn(n, 2) * 0.05 * scale, axis=0)
    q = base + np.cumsum(rng.randn(m, 2) * 0.05 * scale, axis=0)
    return p, q


PAIRS = [(0, 20, 25), (1, 31, 17), (2, 12, 12)]


def _latlon_to_ref(t):
    """(lat, lon) -> the reference's spherical (lon, lat) column order."""
    return t[:, ::-1].copy()


@pytest.mark.parametrize("seed,n,m", PAIRS)
def test_dtw_euclidean(ref, seed, n, m):
    p, q = _traj_pair(seed, n, m)
    ours = float(D.dtw(p, q, "euclidean"))
    theirs = ref.dtw.e_dtw(p, q)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


@pytest.mark.parametrize("seed,n,m", PAIRS)
def test_dtw_spherical(ref, seed, n, m):
    p, q = _traj_pair(seed, n, m)
    ours = float(D.dtw(p, q, "spherical"))
    theirs = ref.dtw.s_dtw(_latlon_to_ref(p), _latlon_to_ref(q))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


@pytest.mark.parametrize("seed,n,m", PAIRS)
def test_sspd_both_metrics(ref, seed, n, m):
    p, q = _traj_pair(seed, n, m)
    np.testing.assert_allclose(
        float(D.sspd(p, q, "euclidean")), ref.sspd.e_sspd(p, q), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(D.sspd(p, q, "spherical")),
        ref.sspd.s_sspd(_latlon_to_ref(p), _latlon_to_ref(q)),
        rtol=1e-4,
    )


@pytest.mark.parametrize("seed,n,m", PAIRS)
def test_hausdorff_both_metrics(ref, seed, n, m):
    p, q = _traj_pair(seed, n, m)
    np.testing.assert_allclose(
        float(D.hausdorff(p, q, "euclidean")),
        ref.hausdorff.e_hausdorff(p, q),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(D.hausdorff(p, q, "spherical")),
        ref.hausdorff.s_hausdorff(_latlon_to_ref(p), _latlon_to_ref(q)),
        rtol=1e-4,
    )


@pytest.mark.parametrize("seed,n,m", PAIRS)
def test_lcss_both_metrics(ref, seed, n, m):
    p, q = _traj_pair(seed, n, m)
    eps_deg = 0.009  # the reference caller's epsilon (flyability_eval.py:304)
    np.testing.assert_allclose(
        float(D.lcss(p, q, eps_deg, "euclidean")),
        ref.lcss.e_lcss(p, q, eps_deg),
        atol=1e-6,
    )
    eps_m = 9000.0  # spherical epsilon in meters (flyability_eval.py:329)
    np.testing.assert_allclose(
        float(D.lcss(p, q, eps_m, "spherical")),
        ref.lcss.s_lcss(_latlon_to_ref(p), _latlon_to_ref(q), eps_m),
        atol=1e-6,
    )


@pytest.mark.parametrize("seed,n,m", PAIRS)
def test_edr_both_metrics(ref, seed, n, m):
    p, q = _traj_pair(seed, n, m)
    np.testing.assert_allclose(
        float(D.edr(p, q, 0.009, "euclidean")),
        ref.edr.e_edr(p, q, 0.009),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        float(D.edr(p, q, 9000.0, "spherical")),
        ref.edr.s_edr(_latlon_to_ref(p), _latlon_to_ref(q), 9000.0),
        atol=1e-6,
    )


@pytest.mark.parametrize("seed,n,m", PAIRS)
def test_erp_both_metrics(ref, seed, n, m):
    p, q = _traj_pair(seed, n, m)
    g = p[0]  # reference uses the departure airport as the gap point (:336)
    np.testing.assert_allclose(
        float(D.erp(p, q, g, "euclidean")), ref.erp.e_erp(p, q, g), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(D.erp(p, q, g, "spherical")),
        ref.erp.s_erp(_latlon_to_ref(p), _latlon_to_ref(q), _latlon_to_ref(g[None])[0]),
        rtol=1e-4,
    )


@pytest.mark.parametrize("seed,n,m", PAIRS)
def test_discret_frechet(ref, seed, n, m):
    p, q = _traj_pair(seed, n, m)
    np.testing.assert_allclose(
        float(D.discret_frechet(p, q, "euclidean")),
        ref.discret_frechet.discret_frechet(p, q),
        rtol=1e-5,
    )


def _densify(t, k):
    """Insert k-1 evenly spaced points per segment (same polyline curve)."""
    segs = [
        t[i] * (1 - a) + t[i + 1] * a
        for i in range(len(t) - 1)
        for a in np.linspace(0.0, 1.0, k, endpoint=False)
    ]
    return np.array(segs + [t[-1]])


@pytest.mark.parametrize("seed,n,m", PAIRS + [(3, 8, 9), (4, 15, 22)])
def test_continuous_frechet_vs_dense_discrete_truth(ref, seed, n, m):
    """Ground truth via the reference's OWN discret_frechet on densified
    curves (discrete Frechet of a densified polyline converges to the
    continuous Frechet of the polyline from above)."""
    p, q = _traj_pair(seed, n, m)
    ours = D.frechet(p, q)
    truth = ref.discret_frechet.discret_frechet(_densify(p, 64), _densify(q, 64))
    np.testing.assert_allclose(ours, truth, rtol=2e-3)


def test_continuous_frechet_reference_agreement_and_known_bug(ref):
    """The reference's frechet.py critical-value enumeration UNDERESTIMATES
    on some inputs (its free-space reachability propagation is buggy); we
    match it where it is correct and exceed it where it is not. Documented
    deviation — see distances.py frechet_jax docstring."""
    # correct cases: reference == dense-discrete truth == ours
    for seed, n, m in [(0, 20, 25), (2, 12, 12), (3, 8, 9)]:
        p, q = _traj_pair(seed, n, m)
        theirs = ref.frechet.frechet(p, q)
        truth = ref.discret_frechet.discret_frechet(
            _densify(p, 64), _densify(q, 64)
        )
        np.testing.assert_allclose(theirs, truth, rtol=1e-6)
        np.testing.assert_allclose(D.frechet(p, q), theirs, rtol=2e-3)
    # known-bug case: reference 0.2925 < truth 0.4007; ours matches truth
    p, q = _traj_pair(1, 31, 17)
    theirs = ref.frechet.frechet(p, q)
    truth = ref.discret_frechet.discret_frechet(_densify(p, 64), _densify(q, 64))
    assert theirs < 0.75 * truth  # the reference's underestimate
    np.testing.assert_allclose(D.frechet(p, q), truth, rtol=2e-3)
