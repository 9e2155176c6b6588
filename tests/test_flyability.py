"""BlueSky harness + flyability CLI tests with a stub simulator.

The stub executable parses the generated master scenario, follows each
flight's DEFWPT waypoints with small noise, and writes an EVALLOG-format
log — exercising scenario building, subprocess invocation, log parsing,
annotation, destination truncation, and distance scoring end to end
without the real simulator (SURVEY.md §4 test strategy, point e).
"""

import pytest

pytestmark = pytest.mark.slow

import os
import stat
import textwrap

import numpy as np
import pandas as pd
import pytest

from tvqvae_tpu.data.preprocess import AIRPORTS
from tvqvae_tpu.evaluation.flyability import (
    BlueSkyConfig,
    simulate,
)
from tvqvae_tpu.evaluation.flyability.bluesky import (
    add_ground_speed,
    build_scenario,
    remove_neighbours,
    simplify_track,
)


STUB = textwrap.dedent(
    """\
    #!/usr/bin/env python3
    # stub bluesky: reads the master .scn, replays DEFWPT waypoints with
    # noise, writes an EVALLOG csv into the logs directory
    import os, re, sys, time

    scen = sys.argv[sys.argv.index("--scenfile") + 1]
    logs_dir = os.environ["STUB_LOGS_DIR"]
    base = os.path.dirname(scen)
    flights = {}
    with open(scen) as f:
        for line in f:
            m = re.search(r">PCALL (.*output_(.*)\\.scn)", line.strip())
            if m:
                flights[m.group(2)] = m.group(1)
    rows = []
    for fid, path in flights.items():
        wpts = []
        with open(path) as f:
            for line in f:
                m = re.search(r">CRE \\S+ \\S+ ([-\\d.]+) ([-\\d.]+)", line)
                if m:
                    wpts.append((float(m.group(1)), float(m.group(2)), 10000.0))
                m = re.search(r">DEFWPT \\S+?,([-\\d.]+), ([-\\d.]+)", line)
                if m:
                    wpts.append((float(m.group(1)), float(m.group(2)), 10000.0))
        for k, (lat, lon, alt) in enumerate(wpts):
            rows.append(f"{k * 10.0},{lat + 0.001},{lon - 0.001},{alt},{fid}")
    os.makedirs(logs_dir, exist_ok=True)
    out = os.path.join(logs_dir, f"EVALLOG_{time.time_ns()}.log")
    with open(out, "w") as f:
        f.write("# stub log\\n")
        f.write("\\n".join(rows) + "\\n")
    """
)


def _make_points(n_flights=4, n_pts=25, seed=0):
    rng = np.random.default_rng(seed)
    lat0, lon0 = AIRPORTS["EHAM"]
    lat1, lon1 = AIRPORTS["LIMC"]
    frames = []
    for i in range(n_flights):
        t = np.linspace(0, 1, n_pts)
        lat = lat0 + (lat1 - lat0) * t + rng.normal(0, 0.01, n_pts)
        lon = lon0 + (lon1 - lon0) * t + rng.normal(0, 0.01, n_pts)
        lat[-1], lon[-1] = lat1, lon1
        alt = np.clip(30000 * np.sin(np.pi * t), 0, None)
        ts = pd.Timestamp("2020-01-01", tz="utc") + pd.to_timedelta(
            t * 5400, unit="s"
        )
        frames.append(pd.DataFrame({
            "flight_id": f"SYN{i:05d}", "timestamp": ts,
            "latitude": lat, "longitude": lon, "altitude": alt,
        }))
    return pd.concat(frames, ignore_index=True)


@pytest.fixture
def stub_cmd(tmp_path):
    stub = tmp_path / "bluesky_stub.py"
    stub.write_text(STUB)
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    logs_dir = tmp_path / "stub_logs"
    os.environ["STUB_LOGS_DIR"] = str(logs_dir)
    return f"python3 {stub} --headless --scenfile {{scenfile}}", str(logs_dir)


def test_ground_speed_and_neighbours():
    pts = _make_points(1)
    f = add_ground_speed(pts)
    assert "groundspeed" in f
    assert (f["groundspeed"].to_numpy() > 0).all()
    # repeated coordinates get dropped
    dup = pd.concat([pts.iloc[:1], pts]).reset_index(drop=True)
    cleaned = remove_neighbours(dup)
    assert len(cleaned) == len(pts)


def test_simplify_track_reduces_points():
    pts = _make_points(1, n_pts=100)
    s = simplify_track(pts, tolerance_m=2000.0)
    assert 2 <= len(s) < len(pts)
    # endpoints kept
    assert s.iloc[0]["latitude"] == pts.iloc[0]["latitude"]
    assert s.iloc[-1]["latitude"] == pts.iloc[-1]["latitude"]


def test_build_scenario_format(tmp_path):
    pts = add_ground_speed(_make_points(1))
    fname = build_scenario(pts, str(tmp_path / "scen"), "A319")
    content = open(fname).read()
    assert content.startswith("00:00:00.00>CRE SYN00000 A319 ")
    assert "DEFWPT" in content and "ADDWPT" in content
    assert "LNAV ON" in content and "VNAV ON" in content
    assert content.strip().endswith("QUIT")


def test_simulate_with_stub(tmp_path, stub_cmd):
    cmd, logs_dir = stub_cmd
    pts = _make_points(4)
    cfg = BlueSkyConfig(
        workdir=str(tmp_path / "work"), logs_directory=logs_dir,
        command=cmd, batch_size=2, simulation_time="00:10:00", delta=None,
    )
    sim = simulate(pts, cfg)
    assert sim["flight_id"].nunique() == 4
    assert {"latitude", "longitude", "altitude", "timestamp"} <= set(sim.columns)
    # stub offsets coordinates by ~0.001 deg
    orig0 = pts[pts.flight_id == "SYN00000"]["latitude"].iloc[0]
    sim0 = sim[sim.flight_id == "SYN00000"]["latitude"].iloc[0]
    assert abs(sim0 - orig0) < 0.01


def test_flyability_cli_end_to_end(tmp_path, stub_cmd):
    cmd, logs_dir = stub_cmd
    pts = _make_points(3)
    # pack as the generate CLI's npz: (N, C, L) original units
    ids = sorted(pts["flight_id"].unique())
    X = np.stack([
        pts[pts.flight_id == fid][
            ["latitude", "longitude", "altitude"]
        ].to_numpy().T
        for fid in ids
    ])
    td = np.tile(np.linspace(0, 5400, X.shape[-1]), (len(ids), 1))[:, None, :]
    X = np.concatenate([X, td], axis=1).astype(np.float32)
    npz = tmp_path / "synthetic.npz"
    np.savez_compressed(npz, X=X, y=np.zeros(len(ids), np.int64))

    from tvqvae_tpu.scripts import evaluate_flyability as cli

    save = str(tmp_path / "fly")
    cli.main([
        "--synthetic_file", str(npz), "--save_dir", save,
        "--ADEP", "EHAM", "--ADES", "LIMC",
        "--bluesky_cmd", cmd, "--logs_directory", logs_dir,
        "--batch_size", "2",
    ])
    assert os.path.exists(os.path.join(save, "synthetic_simulated.csv"))
    import json

    with open(os.path.join(save, "synthetic_distances.json")) as f:
        res = json.load(f)
    assert len(res["summary"]) == 14
    for k, v in res["summary"].items():
        assert np.isfinite(v["mean"]), k
    assert os.path.exists(os.path.join(save, "synthetic_distance_cdfs.png"))
