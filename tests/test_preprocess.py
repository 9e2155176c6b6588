"""Preprocessing-pipeline tests with synthetic OpenSky/EuroControl CSVs."""

import os

import numpy as np
import pandas as pd
import pytest

from tvqvae_tpu.data.preprocess import (
    AIRPORTS,
    assign_flight_ids,
    flights_with_large_consecutive_distance,
    haversine_np,
    prepare_trajectories,
    remove_outliers,
    resample_flight,
)


def _synthetic_route_df(n_flights=12, n_pts=40, seed=0, jump_flight=None):
    """Flights from EHAM to LIMC: great-circle-ish interpolation + noise."""
    rng = np.random.default_rng(seed)
    lat0, lon0 = AIRPORTS["EHAM"]
    lat1, lon1 = AIRPORTS["LIMC"]
    rows = []
    for i in range(n_flights):
        t = np.linspace(0, 1, n_pts)
        lat = lat0 + (lat1 - lat0) * t + rng.normal(0, 0.02, n_pts)
        lon = lon0 + (lon1 - lon0) * t + rng.normal(0, 0.02, n_pts)
        lat[0], lon[0] = lat0, lon0
        lat[-1], lon[-1] = lat1, lon1
        if jump_flight is not None and i == jump_flight:
            lat[n_pts // 2] += 3.0  # ~300 km teleport
        alt = 35000 * np.sin(np.pi * t) + rng.normal(0, 100, n_pts)
        ts = pd.Timestamp("2021-06-01", tz="utc") + pd.to_timedelta(
            i * 86400 + t * 5400, unit="s"
        )
        rows.append(pd.DataFrame({
            "timestamp": ts, "latitude": lat, "longitude": lon,
            "altitude": alt, "icao24": f"ab{i:04d}", "callsign": f"KLM{i:03d}",
            "ADEP": "EHAM", "ADES": "LIMC",
        }))
    return pd.concat(rows, ignore_index=True)


def test_haversine_known_distance():
    # EHAM -> LIMC great-circle distance is just under 800 km
    d = haversine_np(*AIRPORTS["EHAM"], *AIRPORTS["LIMC"])
    assert 750 < float(d) < 850


def test_assign_flight_ids_gap_rule():
    base = pd.Timestamp("2021-01-01", tz="utc")
    df = pd.DataFrame({
        "timestamp": [base, base + pd.Timedelta(hours=1),
                      base + pd.Timedelta(hours=10)],
        "icao24": ["a", "a", "a"],
        "callsign": ["X", "X", "X"],
    })
    out = assign_flight_ids(df)
    ids = out["flight_id"].tolist()
    assert ids[0] == ids[1]  # within 6 h
    assert ids[0] != ids[2]  # 9 h gap -> new flight


def test_consecutive_distance_outlier_detection():
    df = _synthetic_route_df(n_flights=4, jump_flight=2)
    df = assign_flight_ids(df)
    bad = flights_with_large_consecutive_distance(df, 50.0)
    assert len(bad) == 1


def test_remove_outliers_drops_jumpy_flight():
    df = _synthetic_route_df(n_flights=6, jump_flight=1)
    df = assign_flight_ids(df)
    n_before = df["flight_id"].nunique()
    out, avg = remove_outliers(df, AIRPORTS["EHAM"], AIRPORTS["LIMC"])
    assert out["flight_id"].nunique() == n_before - 1
    assert avg % 2 == 0


def test_resample_flight_uniform_time():
    df = _synthetic_route_df(n_flights=1, n_pts=30)
    df = assign_flight_ids(df)
    r = resample_flight(df, 50, ["latitude", "longitude", "altitude"])
    assert len(r) == 50
    assert np.allclose(np.diff(r["timedelta"]), np.diff(r["timedelta"])[0])
    assert r["timedelta"].iloc[0] == 0.0
    # endpoints preserved
    np.testing.assert_allclose(r["latitude"].iloc[0], df["latitude"].iloc[0])
    np.testing.assert_allclose(
        r["latitude"].iloc[-1], df["latitude"].iloc[-1], rtol=1e-6
    )


def test_prepare_trajectories_shapes_and_clusters():
    df = _synthetic_route_df(n_flights=10)
    df = assign_flight_ids(df)
    X, labels, ids = prepare_trajectories(df, 32, n_clusters=3)
    assert X.shape == (10, 4, 32)
    assert labels.shape == (10,)
    assert set(np.unique(labels)) <= {0, 1, 2}
    assert len(ids) == 10
    # channel order: lat, lon, alt, timedelta; timedelta monotonically grows
    assert (np.diff(X[:, 3, :], axis=-1) >= 0).all()


def test_preprocess_cli_opensky(tmp_path):
    raw = tmp_path / "raw" / "OpenSky"
    raw.mkdir(parents=True)
    df = _synthetic_route_df(n_flights=10)
    df.to_csv(raw / "opensky_EHAM_LIMC_2021.csv", index=False)

    from tvqvae_tpu.scripts import preprocess as cli

    save = str(tmp_path / "data")
    cli.main([
        "--ADEP", "EHAM", "--ADES", "LIMC",
        "--raw_data_dir", str(tmp_path / "raw"),
        "--data_source", "OpenSky", "--save_dir", save,
        "--n_clusters", "3",
    ])
    z = np.load(os.path.join(save, "OpenSky_EHAM_LIMC.npz"))
    assert z["X"].ndim == 3 and z["X"].shape[1] == 4
    assert z["X"].shape[0] >= 8
    assert z["X"].shape[2] % 2 == 0  # even length for the spectral transform

    # the produced dataset feeds straight into get_data
    from tvqvae_tpu.data import get_data

    data = get_data(
        os.path.join(save, "OpenSky_EHAM_LIMC.npz"),
        ["latitude", "longitude", "altitude", "timedelta"],
    )
    assert data.X_train.shape[1] == 4


def test_preprocess_cli_landing(tmp_path):
    raw = tmp_path / "raw" / "landing"
    raw.mkdir(parents=True)
    # flights approaching ENGM: final 100 km
    rng = np.random.default_rng(0)
    lat1, lon1 = AIRPORTS["ENGM"]
    rows = []
    for i in range(8):
        t = np.linspace(0, 1, 60)
        lat = lat1 - 2.5 * (1 - t) + rng.normal(0, 0.01, 60)
        lon = lon1 - 2.5 * (1 - t) + rng.normal(0, 0.01, 60)
        lat[-1], lon[-1] = lat1, lon1
        alt = 20000 * (1 - t) ** 1.5 + rng.normal(0, 50, 60)
        ts = pd.Timestamp("2021-06-01", tz="utc") + pd.to_timedelta(
            i * 86400 + t * 2400, unit="s"
        )
        rows.append(pd.DataFrame({
            "timestamp": ts, "latitude": lat, "longitude": lon,
            "altitude": np.clip(alt, 0, None),
            "icao24": f"cd{i:04d}", "callsign": f"SAS{i:03d}",
        }))
    pd.concat(rows).to_csv(raw / "landing_ENGM_2021.csv", index=False)

    from tvqvae_tpu.scripts import preprocess_landing as cli

    save = str(tmp_path / "data")
    cli.main([
        "--ADES", "ENGM", "--raw_data_dir", str(tmp_path / "raw"),
        "--save_dir", save, "--n_clusters", "2",
    ])
    z = np.load(os.path.join(save, "landing_ENGM.npz"))
    assert z["X"].ndim == 3 and z["X"].shape[1] == 4
    assert z["X"].shape[0] >= 6
