"""Host-side ADS-B preprocessing: raw CSV -> clustered, resampled tensors.

Re-implementation of the reference preprocessing pipeline
(timevqvae/scripts/preprocess.py and preprocess_landing.py) without the
`traffic`/`cartopy` dependency chain: pandas/numpy/sklearn only, emitting
the framework-native .npz (X (N, C, L), y) and, when `traffic` is
importable, the reference-compatible Traffic pickle.

Pipeline parity (preprocess.py:502-538):
  1. load EuroControl (Flights_*.csv + Flight_Points_Actual_*.csv join,
     :52-127) or OpenSky (single CSV, :358-416) points,
  2. flight-id assignment by (icao24, callsign) with a 6 h gap rule
     (:186-210),
  3. outlier removal (:213-355): consecutive-haversine > 50 km, first/last
     point > 100 km from ADEP/ADES, altitude z-score > 2.2, shortest
     sequences z < -1.4, duplicate timestamps,
  4. average sequence length forced even (:100-105, 408-413),
  5. per-flight timedelta, GMM(5) clustering on <=1000-point resampled
     lat/lon (seed 199, :457-472), uniform-time resampling to the average
     length (:476-478).

Deviations (documented): the reference clusters on EuroPP-projected
coordinates (cartopy); without pyproj we use a local azimuthal equidistant
approximation (exact enough for GMM clustering of same-route corridors —
both are then StandardScaler-normalized anyway). Airport coordinates come
from a built-in table of major airports / explicit CLI overrides /
`traffic.data.airports` when available.
"""

from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
from scipy.stats import zscore


# Public coordinates of commonly used airports (lat, lon); extend via CLI
# --adep_latlon/--ades_latlon or the optional `traffic` database.
AIRPORTS: Dict[str, Tuple[float, float]] = {
    "EHAM": (52.3086, 4.7639),   # Amsterdam Schiphol
    "LIMC": (45.6306, 8.7281),   # Milan Malpensa
    "ENGM": (60.1939, 11.1004),  # Oslo Gardermoen
    "EGLL": (51.4706, -0.4619),  # London Heathrow
    "EGKK": (51.1481, -0.1903),  # London Gatwick
    "LFPG": (49.0097, 2.5479),   # Paris CDG
    "LFPO": (48.7233, 2.3794),   # Paris Orly
    "LOWW": (48.1103, 16.5697),  # Vienna
    "EDDF": (50.0379, 8.5622),   # Frankfurt
    "EDDM": (48.3538, 11.7861),  # Munich
    "LEMD": (40.4719, -3.5626),  # Madrid
    "LEBL": (41.2971, 2.0785),   # Barcelona
    "LIRF": (41.8003, 12.2389),  # Rome Fiumicino
    "EKCH": (55.6179, 12.6560),  # Copenhagen
    "ESSA": (59.6519, 17.9186),  # Stockholm Arlanda
    "LSZH": (47.4647, 8.5492),   # Zurich
    "EBBR": (50.9014, 4.4844),   # Brussels
    "LPPT": (38.7813, -9.1359),  # Lisbon
    "LGAV": (37.9364, 23.9445),  # Athens
    "EIDW": (53.4213, -6.2701),  # Dublin
    "EDDT": (52.5597, 13.2877),  # Berlin Tegel
    "EDDB": (52.3667, 13.5033),  # Berlin Brandenburg
    "LTFM": (41.2753, 28.7519),  # Istanbul
    "UUEE": (55.9726, 37.4146),  # Moscow Sheremetyevo
    "LIML": (45.4494, 9.2783),   # Milan Linate
    "EHRD": (51.9569, 4.4372),   # Rotterdam
}


def airport_latlon(code: str, override: Optional[Tuple[float, float]] = None):
    if override is not None:
        return tuple(override)
    if code in AIRPORTS:
        return AIRPORTS[code]
    try:  # traffic's airport database, when installed
        from traffic.data import airports as _airports

        return tuple(_airports[code].latlon)
    except Exception:
        raise KeyError(
            f"Unknown airport {code}: pass --adep_latlon/--ades_latlon "
            f"or install the `traffic` library."
        )


# --------------------------------------------------------------------------
# geometry helpers (vectorized haversine; reference data_utils.py:154-222)


def haversine_np(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Great-circle distance in km (vectorized)."""
    lat1, lon1, lat2, lon2 = map(np.radians, (lat1, lon1, lat2, lon2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = np.sin(dlat / 2) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2) ** 2
    return 6371.0 * 2 * np.arctan2(np.sqrt(a), np.sqrt(1 - a))


def flights_with_large_consecutive_distance(
    df: pd.DataFrame, threshold_km: float
) -> np.ndarray:
    """Flag flights with any >threshold jump between consecutive points
    (reference data_utils.py:195-222)."""
    df = df.sort_values(["flight_id", "timestamp"])
    nxt_lat = df.groupby("flight_id")["latitude"].shift(-1)
    nxt_lon = df.groupby("flight_id")["longitude"].shift(-1)
    d = haversine_np(df["latitude"], df["longitude"], nxt_lat, nxt_lon)
    return df.loc[np.asarray(d > threshold_km), "flight_id"].unique()


def flights_far_from(
    df: pd.DataFrame, latlon: Tuple[float, float], threshold_km: float,
    which: str,
) -> pd.Index:
    """Flights whose first/last point is > threshold from an airport
    (reference data_utils.py:224-259)."""
    pts = df.groupby("flight_id").first() if which == "first" else (
        df.groupby("flight_id").last()
    )
    d = haversine_np(pts["latitude"], pts["longitude"], latlon[0], latlon[1])
    return pts.index[np.asarray(d) > threshold_km]


# --------------------------------------------------------------------------
# flight-id assignment + outlier removal


def assign_flight_ids(df: pd.DataFrame, window_hours: float = 6.0) -> pd.DataFrame:
    """(icao24, callsign) key + 6 h gap rule -> flight_id
    (reference preprocess.py:186-210)."""
    df = df.sort_values("timestamp").copy()
    key = df["icao24"].astype(str) + "_" + df["callsign"].astype(str)
    df["_key"] = key
    gaps = (
        df.groupby("_key")["timestamp"].diff().dt.total_seconds() / 3600.0
    )
    group = (gaps > window_hours).cumsum()
    first_ts = df.groupby(["_key", group])["timestamp"].transform("first")
    df["flight_id"] = df["_key"] + "_" + first_ts.dt.strftime("%Y%m%d_%H%M%S")
    return df.drop(columns="_key")


def remove_outliers(
    df: pd.DataFrame,
    adep_latlon: Optional[Tuple[float, float]],
    ades_latlon: Tuple[float, float],
    consecutive_km: float = 50.0,
    airport_km: float = 100.0,
    altitude_z: float = 2.2,
    short_seq_z: float = -1.4,
) -> Tuple[pd.DataFrame, int]:
    """Reference preprocess.py:213-355 (en-route) / preprocess_landing.py:
    91-204 (pass adep_latlon=None to skip the initial-distance rule).
    Returns the filtered points and the even-forced average length."""
    cons = flights_with_large_consecutive_distance(df, consecutive_km)
    drop_ids = set(cons)
    if adep_latlon is not None:
        drop_ids |= set(flights_far_from(df, adep_latlon, airport_km, "first"))
    drop_ids |= set(flights_far_from(df, ades_latlon, airport_km, "last"))

    # altitude z-score outlier ROWS are dropped (not whole flights)
    z = zscore(df["altitude"].to_numpy())
    df = df[np.abs(z) <= altitude_z]
    df = df[~df["flight_id"].isin(drop_ids)].reset_index(drop=True)

    sizes = df.groupby("flight_id").size()
    avg_len = float(sizes.mean())
    zs = zscore(sizes.to_numpy())
    short = sizes.index[zs < short_seq_z]
    df = df[~df["flight_id"].isin(short)]

    dup = df[df.duplicated(subset=["flight_id", "timestamp"], keep=False)]
    df = df[~df["flight_id"].isin(dup["flight_id"].unique())]
    df = df.reset_index(drop=True)

    avg = int(avg_len)
    if avg % 2:
        avg -= 1  # even length for the spectral transform (reference :100-105)
    return df, avg


# --------------------------------------------------------------------------
# loaders


def load_eurocontrol(
    base_path: str, adep: str, ades: str
) -> Tuple[pd.DataFrame, int]:
    """EuroControl monthly directories: Flights_*.csv joined with
    Flight_Points_Actual_*.csv (reference preprocess.py:21-127)."""
    import glob
    import os

    frames = []
    for directory in sorted(glob.glob(os.path.join(base_path, "20????"))):
        flights = pd.read_csv(
            glob.glob(os.path.join(directory, "Flights_*.csv"))[0]
        )
        points = pd.read_csv(
            glob.glob(os.path.join(directory, "Flight_Points_Actual_*.csv"))[0]
        )
        sel = flights[(flights["ADEP"] == adep) & (flights["ADES"] == ades)]
        pts = points[points["ECTRL ID"].isin(sel["ECTRL ID"])]
        pts = pts.merge(sel[["ECTRL ID", "ADEP", "ADES", "AC Type"]],
                        on="ECTRL ID")
        if len(pts):
            frames.append(pts)
    df = pd.concat(frames, ignore_index=True)

    dup = df[df.duplicated(subset=["ECTRL ID", "Time Over"])]
    df = df[~df["ECTRL ID"].isin(dup["ECTRL ID"].unique())]
    df["callsign"] = df["ECTRL ID"]
    df["icao24"] = df["ECTRL ID"]

    avg = int(df.groupby("ECTRL ID").size().mean())
    if avg % 2:
        avg -= 1

    df = df.rename(columns={
        "ECTRL ID": "flight_id",
        "Latitude": "latitude",
        "Longitude": "longitude",
        "Flight Level": "altitude",
        "Time Over": "timestamp",
    })
    df["altitude"] = df["altitude"] * 100.0  # flight level -> feet
    df["timestamp"] = pd.to_datetime(
        df["timestamp"], format="%d-%m-%Y %H:%M:%S", utc=True
    )
    if "Sequence Number" in df.columns:
        df = df.drop(columns=["Sequence Number"])
    return df.reset_index(drop=True), avg


def load_opensky(
    base_path: str, adep: str, ades: str,
    adep_latlon=None, ades_latlon=None,
) -> Tuple[pd.DataFrame, int]:
    """OpenSky CSV export (reference preprocess.py:358-416)."""
    import glob
    import os

    files = [
        f for f in glob.glob(os.path.join(base_path, "*.csv"))
        if adep in os.path.basename(f) and ades in os.path.basename(f)
    ]
    assert files, f"no OpenSky csv for {adep}->{ades} under {base_path}"
    df = pd.read_csv(files[0])
    if "Unnamed: 0" in df.columns:
        df = df.drop(columns=["Unnamed: 0"])
    df = df.dropna().reset_index(drop=True)
    df = df[df["altitude"] >= 0]
    df = df.rename(columns={
        "estdepartureairport": "ADEP", "estarrivalairport": "ADES",
    })
    df["timestamp"] = pd.to_datetime(df["timestamp"], utc=True, format="ISO8601")
    df = df.sort_values("timestamp")
    df = assign_flight_ids(df, window_hours=6)
    adep_ll = airport_latlon(adep, adep_latlon)
    ades_ll = airport_latlon(ades, ades_latlon)
    df, avg = remove_outliers(df, adep_ll, ades_ll)
    return df, avg


# --------------------------------------------------------------------------
# trajectory preparation


def _local_xy(lat: np.ndarray, lon: np.ndarray, lat0: float, lon0: float):
    """Local azimuthal-equidistant-style projection (km) — the EuroPP stand-in
    for clustering features (scale-equivalent after StandardScaler)."""
    R = 6371.0
    x = np.radians(lon - lon0) * R * np.cos(np.radians(lat0))
    y = np.radians(lat - lat0) * R
    return x, y


def resample_flight(
    df: pd.DataFrame, n_samples: int, columns: List[str]
) -> pd.DataFrame:
    """Uniform-in-time linear resampling of one flight's numeric columns
    (the reference's traffic `.resample(n)`, preprocess.py:476-478)."""
    t = df["timestamp"].astype("int64").to_numpy().astype(np.float64)
    t = (t - t[0]) / 1e9
    tq = np.linspace(t[0], t[-1], n_samples)
    out = {"timestamp": pd.to_datetime(
        df["timestamp"].iloc[0].value + (tq * 1e9).astype(np.int64), utc=True
    )}
    for c in columns:
        out[c] = np.interp(tq, t, df[c].to_numpy(np.float64))
    res = pd.DataFrame(out)
    res["timedelta"] = tq - tq[0]
    return res


def prepare_trajectories(
    df: pd.DataFrame,
    n_samples: int,
    n_clusters: int = 5,
    cluster_seed: int = 199,
    columns: Optional[List[str]] = None,
) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """timedelta assignment + GMM clustering + resampling
    (reference preprocess.py:435-479). Returns (X (N, C, L), labels, ids)
    with channels [latitude, longitude, altitude, timedelta]."""
    from sklearn.mixture import GaussianMixture
    from sklearn.preprocessing import StandardScaler

    columns = columns or ["latitude", "longitude", "altitude"]
    groups = [g for _, g in df.sort_values("timestamp").groupby("flight_id")]
    ids = [g["flight_id"].iloc[0] for g in groups]
    groups = [g for g in groups if len(g) >= 2]

    resampled = [resample_flight(g, n_samples, columns) for g in groups]
    feats = ["latitude", "longitude", "altitude", "timedelta"]
    X = np.stack(
        [r[feats].to_numpy(np.float32).T for r in resampled]
    )  # (N, C, L)

    # clustering features: <=1000-point resampled lat/lon in projected,
    # standardized coordinates (reference :457-472)
    nb = n_samples if n_samples < 1000 else 1000
    lat0 = float(df["latitude"].mean())
    lon0 = float(df["longitude"].mean())
    cl_feats = []
    for g in groups:
        r = resample_flight(g, nb, ["latitude", "longitude"])
        x, y = _local_xy(
            r["latitude"].to_numpy(), r["longitude"].to_numpy(), lat0, lon0
        )
        cl_feats.append(np.stack([y, x], axis=-1).ravel())
    F = StandardScaler().fit_transform(np.stack(cl_feats))
    np.random.seed(cluster_seed)
    labels = GaussianMixture(
        n_components=n_clusters, random_state=cluster_seed
    ).fit_predict(F)
    return X, labels.astype(np.int64), ids


def export_dataset(
    path_base: str,
    X: np.ndarray,
    labels: np.ndarray,
    ids: List[str],
    features=("latitude", "longitude", "altitude", "timedelta"),
) -> str:
    """Write the native .npz; also a Traffic pickle when `traffic` exists."""
    npz_path = path_base + ".npz"
    np.savez_compressed(npz_path, X=X.astype(np.float32), y=labels)
    try:
        from traffic.core import Traffic

        frames = []
        t0 = pd.Timestamp("2020-01-01", tz="utc")
        td = list(features).index("timedelta")
        for i in range(X.shape[0]):
            f = pd.DataFrame({c: X[i, j] for j, c in enumerate(features)})
            f["timestamp"] = t0 + pd.to_timedelta(X[i, td], unit="s")
            f["flight_id"] = str(ids[i])
            f["callsign"] = str(ids[i])
            f["icao24"] = str(ids[i])
            f["cluster"] = int(labels[i])
            frames.append(f)
        Traffic(pd.concat(frames)).to_pickle(path_base + ".pkl")
    except ImportError:
        pass
    return npz_path
