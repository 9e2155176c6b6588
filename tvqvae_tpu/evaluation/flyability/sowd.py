"""SOWD (Symmetric One-Way Distance) on a geohash grid + all-pairs segment
distance — the last unported trajectory-distance files.

Reference: timevqvae/evaluation/flyability_utils/trajectory_distances/
sowd.py:1-169, linecell.py:1-229, segment_distance.py:1-84 (vendored from
bguillouet/traj-dist). These are DEAD, UNEXPORTED code in the reference
(flyability_utils/__init__.py exports neither; `sowd()`'s own grid path is
broken — it unpacks 3 of trajectory_set_grid's 5 return values — and
linecell imports geohash2/shapely, neither a declared dependency). Ported
here for completeness behind the same API, in working form.

TPU-native design notes:
- The reference's `owd_grid` is a data-dependent pruning walk over
  candidate min-cells — a CPU optimization of `owd_grid_brut` (mean over
  cells of t1 of the min distance to cells of t2) that saves scalar work
  but is hostile to XLA (dynamic candidate sets). The brute formulation is
  one broadcasted (n1, n2) distance matrix — minutes of python vs
  microseconds on the MXU — so the jitted kernel computes that directly;
  `owd_grid`'s pruning is mathematically a shortcut for the same min scan
  (both reduce to min-distance per cell; the reference's own commented-out
  check at sowd.py:136-137 asserts their equivalence).
- Cell rasterization (linecell.py) is scalar host-side prep, not a hot
  path: reimplemented in numpy with exact segment/grid-line intersections
  (replacing shapely's LineString.intersection with the closed-form linear
  interpolation it computes) over the same geohash-derived grid
  (decode_exactly semantics re-derived from the geohash spec —
  tests/test_sowd.py pins the standard test vectors).
- segments_distance (all-pairs TRACLUS-style mixed distance) is a pure
  broadcasted kernel; the ordering branch (larger segment first,
  segment_distance.py:65-72) and the theta clamp are jnp.where selects.
"""

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "geohash_encode",
    "geohash_decode_exactly",
    "trajectory_set_grid",
    "owd_grid_brut",
    "sowd_grid",
    "sowd",
    "segments_distance",
]

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lat: float, lon: float, precision: int = 7) -> str:
    """Standard geohash encoding (5 bits/char, lon first on even bits)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits = []
    even = True
    while len(bits) < precision * 5:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
    chars = []
    for i in range(0, len(bits), 5):
        v = 0
        for b in bits[i:i + 5]:
            v = (v << 1) | b
        chars.append(_BASE32[v])
    return "".join(chars)


def geohash_decode_exactly(gh: str) -> Tuple[float, float, float, float]:
    """-> (lat_center, lon_center, lat_err, lon_err), like
    geohash2.decode_exactly (the linecell.py:148-149 call)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    even = True
    for ch in gh:
        v = _BASE32.index(ch)
        for shift in range(4, -1, -1):
            bit = (v >> shift) & 1
            if even:
                mid = (lon_lo + lon_hi) / 2
                if bit:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if bit:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return (
        (lat_lo + lat_hi) / 2,
        (lon_lo + lon_hi) / 2,
        (lat_hi - lat_lo) / 2,
        (lon_hi - lon_lo) / 2,
    )


def _grid_for(traj_set: Sequence[np.ndarray], precision: int):
    """Geohash-aligned cell grid covering the trajectory set, identical to
    linecell.trajectory_set_grid:142-153 (cell edges at the decoded corner
    cells' edges, width 2*dlon / 2*dlat)."""
    allpts = np.concatenate([np.asarray(t, float) for t in traj_set])
    lon_min, lat_min = allpts[:, 0].min(), allpts[:, 1].min()
    lon_max, lat_max = allpts[:, 0].max(), allpts[:, 1].max()
    lat_ble, lon_ble, dlat, dlon = geohash_decode_exactly(
        geohash_encode(lat_min, lon_min, precision)
    )
    lat_tre, lon_tre, _, _ = geohash_decode_exactly(
        geohash_encode(lat_max, lon_max, precision)
    )
    lats_all = np.arange(lat_ble - dlat, lat_tre + 3 * dlat, dlat * 2)
    lons_all = np.arange(lon_ble - dlon, lon_tre + 3 * dlon, dlon * 2)
    return lons_all, lats_all, dlon, dlat


def _cell_of(p, lons_all, lats_all):
    cx = int(np.searchsorted(lons_all, p[0], side="right") - 1)
    cy = int(np.searchsorted(lats_all, p[1], side="right") - 1)
    return cx, cy


def _raster_segment(p0, p1, lons_all, lats_all):
    """Cells crossed by segment p0->p1, in order, via exact crossings of the
    grid lines (the closed-form of linecell's shapely intersections)."""
    c0 = _cell_of(p0, lons_all, lats_all)
    c1 = _cell_of(p1, lons_all, lats_all)
    cells = [c0]
    dx = p1[0] - p0[0]
    dy = p1[1] - p0[1]
    # parametric crossing times of every interior grid line
    ts = []
    if dx != 0:
        lo, hi = sorted((c0[0], c1[0]))
        for k in range(lo + 1, hi + 1):
            ts.append(((lons_all[k] - p0[0]) / dx, "x", 1 if dx > 0 else -1))
    if dy != 0:
        lo, hi = sorted((c0[1], c1[1]))
        for k in range(lo + 1, hi + 1):
            ts.append(((lats_all[k] - p0[1]) / dy, "y", 1 if dy > 0 else -1))
    ts.sort(key=lambda t: t[0])
    cx, cy = c0
    for _, axis, step in ts:
        if axis == "x":
            cx += step
        else:
            cy += step
        cells.append((cx, cy))
    return cells


def trajectory_set_grid(
    traj_set: Sequence[np.ndarray], precision: int = 7
) -> Tuple[List[np.ndarray], np.ndarray, np.ndarray]:
    """Rasterize each (n, 2) lon/lat trajectory onto the shared geohash
    grid -> list of (m_i, 2) int cell-index arrays (consecutive duplicates
    collapsed, like linecell.py:200-209), plus the grid edge vectors."""
    lons_all, lats_all, _, _ = _grid_for(traj_set, precision)
    out = []
    for traj in traj_set:
        traj = np.asarray(traj, float)
        cells = []
        for i in range(len(traj) - 1):
            seg = _raster_segment(traj[i], traj[i + 1], lons_all, lats_all)
            if cells and seg and tuple(cells[-1]) == tuple(seg[0]):
                seg = seg[1:]
            cells.extend(seg)
        if not cells:  # single-point trajectory
            cells = [_cell_of(traj[0], lons_all, lats_all)]
        out.append(np.asarray(cells, np.int32))
    return out, lons_all, lats_all


@partial(jax.jit, static_argnames=())
def _owd_matrix(c1: jnp.ndarray, c2: jnp.ndarray,
                m1: jnp.ndarray, m2: jnp.ndarray) -> jnp.ndarray:
    """(mean over valid c1 of min over valid c2 distance) with padding
    masks; one broadcasted distance matrix."""
    d = jnp.sqrt(jnp.sum(
        (c1[:, None, :].astype(jnp.float32)
         - c2[None, :, :].astype(jnp.float32)) ** 2, -1))
    d = jnp.where(m2[None, :], d, jnp.inf)
    mins = jnp.min(d, axis=1)
    return jnp.sum(jnp.where(m1, mins, 0.0)) / jnp.maximum(
        jnp.sum(m1), 1
    )


def owd_grid_brut(cells1, cells2) -> float:
    """Reference sowd.py:10-32 semantics on (m, 2) cell arrays."""
    c1 = jnp.asarray(cells1, jnp.float32)
    c2 = jnp.asarray(cells2, jnp.float32)
    return float(_owd_matrix(
        c1, c2,
        jnp.ones(len(c1), bool), jnp.ones(len(c2), bool),
    ))


def sowd_grid(cells1, cells2) -> float:
    """Symmetrized OWD over pre-gridded cell sequences (sowd.py:142-151;
    the brute and pruned variants agree — see module docstring)."""
    return 0.5 * (owd_grid_brut(cells1, cells2)
                  + owd_grid_brut(cells2, cells1))


def sowd(traj_1: np.ndarray, traj_2: np.ndarray, precision: int = 7,
         converted: bool = False) -> float:
    """sowd.py:154-160 — but WORKING (the reference's non-converted path
    crashes on its own trajectory_set_grid return arity)."""
    if converted:
        return sowd_grid(np.asarray(traj_1)[:, :2],
                         np.asarray(traj_2)[:, :2])
    cells, _, _ = trajectory_set_grid([np.asarray(traj_1),
                                       np.asarray(traj_2)], precision)
    return sowd_grid(cells[0], cells[1])


# --------------------------------------------------------------------------
# all-pairs segment distance (segment_distance.py:15-84)


@jax.jit
def _segments_distance_jax(t0: jnp.ndarray, t1: jnp.ndarray) -> jnp.ndarray:
    s_i, e_i = t0[:-1], t0[1:]              # (n0-1, 2)
    s_j, e_j = t1[:-1], t1[1:]              # (n1-1, 2)

    def ordered(si, ei, sj, ej):
        """ordered_mixed_distance broadcast over (I, J) pairs; all inputs
        (I, J, 2)."""
        siei = ei - si
        sjej = ej - sj
        n2_i = jnp.sum(siei * siei, -1)      # (I, J)
        n2_j = jnp.sum(sjej * sjej, -1)
        n_i = jnp.sqrt(n2_i)
        n_j = jnp.sqrt(n2_j)
        sisj = sj - si
        siej = ej - si
        u1 = jnp.sum(sisj * siei, -1) / n2_i
        u2 = jnp.sum(siej * siei, -1) / n2_i
        ps = si + u1[..., None] * siei
        pe = si + u2[..., None] * siei
        cos_t = jnp.clip(jnp.sum(sjej * siei, -1) / (n_i * n_j), -1.0, 1.0)
        theta = jnp.arccos(cos_t)
        lpe1 = jnp.linalg.norm(sj - ps, axis=-1)
        lpe2 = jnp.linalg.norm(ej - pe, axis=-1)
        den = lpe1 + lpe2
        dped = jnp.where(den > 0, (lpe1 ** 2 + lpe2 ** 2)
                         / jnp.maximum(den, 1e-30), 0.0)
        lpa1 = jnp.minimum(jnp.linalg.norm(si - ps, axis=-1),
                           jnp.linalg.norm(ei - ps, axis=-1))
        lpa2 = jnp.minimum(jnp.linalg.norm(si - pe, axis=-1),
                           jnp.linalg.norm(ei - pe, axis=-1))
        dpad = jnp.minimum(lpa1, lpa2)
        half_pi = jnp.float32(np.pi / 2)
        dad = jnp.where(theta < half_pi, n_j * jnp.sin(theta), n_j)
        return (dped + dpad + dad) / 3.0

    I, J = s_i.shape[0], s_j.shape[0]
    si = jnp.broadcast_to(s_i[:, None, :], (I, J, 2))
    ei = jnp.broadcast_to(e_i[:, None, :], (I, J, 2))
    sj = jnp.broadcast_to(s_j[None, :, :], (I, J, 2))
    ej = jnp.broadcast_to(e_j[None, :, :], (I, J, 2))
    # the longer segment of each pair plays the "i" role
    # (segment_distance.py:65-72)
    n2_i = jnp.sum((ei - si) ** 2, -1)
    n2_j = jnp.sum((ej - sj) ** 2, -1)
    swap = (n2_j > n2_i)[..., None]
    a_s = jnp.where(swap, sj, si)
    a_e = jnp.where(swap, ej, ei)
    b_s = jnp.where(swap, si, sj)
    b_e = jnp.where(swap, ei, ej)
    return ordered(a_s, a_e, b_s, b_e)


def segments_distance(traj_0: np.ndarray, traj_1: np.ndarray) -> np.ndarray:
    """(n0-1, n1-1) matrix of TRACLUS mixed distances between every segment
    pair, as one broadcasted jitted kernel."""
    return np.asarray(_segments_distance_jax(
        jnp.asarray(traj_0, jnp.float32)[:, :2],
        jnp.asarray(traj_1, jnp.float32)[:, :2],
    ))
