"""sowd / linecell / segment_distance port (evaluation/flyability/sowd.py)
vs the reference's vendored traj-dist code (trajectory_distances/sowd.py,
segment_distance.py — dead, unexported code in the reference; see the port's
module docstring).

Differential where the reference code runs (owd/sowd on pre-gridded cells,
all-pairs segment distance); spec-vector tests for the geohash math the
reference delegates to the absent geohash2 package; property tests for the
rasterizer (connected 4-path, covers endpoint cells).
"""

import importlib
import os
import sys
import types

import numpy as np
import pytest

# NB: the package re-exports the sowd FUNCTION, which shadows the submodule
# as a package attribute — import the module itself explicitly
S = importlib.import_module("tvqvae_tpu.evaluation.flyability.sowd")

REF_DIST_DIR = (
    "/root/reference/timevqvae/evaluation/flyability_utils/trajectory_distances"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIST_DIR), reason="reference snapshot not present"
)


@pytest.fixture(scope="module")
def ref():
    """Reference sowd + segment_distance as a synthetic package; geohash2/
    shapely (imported at linecell module scope, used only by the grid path
    we do not exercise) get attribute-error stubs."""
    for name in ("geohash2", "geohash2.geohash", "shapely",
                 "shapely.geometry"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = []
            sys.modules[name] = mod
    pkg_name = "_refsowd_pkg"
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [REF_DIST_DIR]
        sys.modules[pkg_name] = pkg
    return types.SimpleNamespace(
        sowd=importlib.import_module(f"{pkg_name}.sowd"),
        seg=importlib.import_module(f"{pkg_name}.segment_distance"),
    )


def _cell_walk(seed, n):
    """Random 4-connected unit-step integer cell path (what the reference's
    grid walker emits)."""
    rng = np.random.RandomState(seed)
    steps = rng.randint(0, 4, n - 1)
    moves = np.array([[1, 0], [-1, 0], [0, 1], [0, -1]])[steps]
    return np.concatenate(
        [[[0, 0]], np.cumsum(moves, 0)], 0
    ).astype(np.float64) + rng.randint(0, 5, 2)


# --- geohash spec vectors (wikipedia's canonical example) ------------------


def test_geohash_roundtrip_spec_vector():
    assert S.geohash_encode(42.605, -5.603, 5) == "ezs42"
    lat, lon, dlat, dlon = S.geohash_decode_exactly("ezs42")
    assert abs(lat - 42.60498) < 1e-4
    assert abs(lon - (-5.60303)) < 1e-4
    assert abs(dlat - 0.02197265625) < 1e-9
    assert abs(dlon - 0.02197265625) < 1e-9


def test_geohash_longer_precision():
    for lat, lon in [(48.2, 6.1), (-33.9, 151.2), (0.0, 0.0)]:
        gh = S.geohash_encode(lat, lon, 9)
        dl_at, dl_on, elat, elon = S.geohash_decode_exactly(gh)
        assert abs(dl_at - lat) <= 2 * elat
        assert abs(dl_on - lon) <= 2 * elon


# --- owd / sowd differential ----------------------------------------------


@pytest.mark.parametrize("seed,n,m", [(0, 12, 17), (1, 30, 8), (2, 5, 5)])
def test_owd_brut_matches_reference(ref, seed, n, m):
    c1, c2 = _cell_walk(seed, n), _cell_walk(seed + 100, m)
    got = S.owd_grid_brut(c1, c2)
    want = ref.sowd.owd_grid_brut(c1, c2)
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("seed,n,m", [(3, 14, 11), (4, 20, 20)])
def test_sowd_grid_matches_reference_brut_and_pruned(ref, seed, n, m):
    c1, c2 = _cell_walk(seed, n), _cell_walk(seed + 100, m)
    got = S.sowd_grid(c1, c2)
    np.testing.assert_allclose(got, ref.sowd.sowd_grid_brut(c1, c2),
                               rtol=1e-6)
    # the reference's pruned owd_grid is its own optimization of brut
    # (sowd.py:136-137); on unit-step walks they agree
    np.testing.assert_allclose(got, ref.sowd.sowd_grid(c1, c2), rtol=1e-6)


# --- rasterizer properties -------------------------------------------------


def test_raster_connected_and_covering():
    rng = np.random.RandomState(7)
    traj = np.array([6.0, 48.0]) + np.cumsum(rng.randn(40, 2) * 0.03, 0)
    cells, lons_all, lats_all = S.trajectory_set_grid([traj], precision=6)
    c = cells[0]
    steps = np.abs(np.diff(c, axis=0)).sum(1)
    assert (steps == 1).all(), "cell path must be a 4-connected unit walk"
    # endpoint cells present
    first = (np.searchsorted(lons_all, traj[0, 0]) - 1,
             np.searchsorted(lats_all, traj[0, 1]) - 1)
    last = (np.searchsorted(lons_all, traj[-1, 0]) - 1,
            np.searchsorted(lats_all, traj[-1, 1]) - 1)
    assert tuple(c[0]) == first
    assert tuple(c[-1]) == last
    # every trajectory POINT's cell appears on the path
    path = {tuple(x) for x in c.tolist()}
    for p in traj:
        assert (np.searchsorted(lons_all, p[0]) - 1,
                np.searchsorted(lats_all, p[1]) - 1) in path


def test_sowd_end_to_end_sane():
    rng = np.random.RandomState(9)
    t1 = np.array([6.0, 48.0]) + np.cumsum(rng.randn(30, 2) * 0.02, 0)
    t2 = t1 + rng.randn(*t1.shape) * 0.001
    t3 = t1 + 0.5  # far away
    d_close = S.sowd(t1, t2, precision=6)
    d_far = S.sowd(t1, t3, precision=6)
    assert 0.0 <= d_close < d_far
    assert S.sowd(t1, t1, precision=6) == 0.0


# --- segments_distance differential ---------------------------------------


@pytest.mark.parametrize("seed,n,m", [(0, 10, 13), (1, 25, 7), (2, 6, 6)])
def test_segments_distance_matches_reference(ref, seed, n, m):
    rng = np.random.RandomState(seed)
    t0 = np.array([6.0, 48.0]) + np.cumsum(rng.randn(n, 2) * 0.05, 0)
    t1 = np.array([6.0, 48.0]) + np.cumsum(rng.randn(m, 2) * 0.05, 0)
    got = S.segments_distance(t0, t1)
    want = ref.seg.segments_distance(t0, t1)
    assert got.shape == want.shape == (n - 1, m - 1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-6)
