"""BlueSky air-traffic-simulator harness for flyability evaluation.

Reference: timevqvae/evaluation/flyability_utils/eval_logic.py:20-417. The
generated trajectories are replayed through the external BlueSky simulator
(an external subprocess, as in the reference :368-370) via .scn scenario
files: per flight a CRE + DEFWPT/ADDWPT waypoint program with LNAV/VNAV, a
CRELOG EVALLOG logger sampling lat/lon/alt/id every `dt` seconds, batches
assembled with PCALL + fast-forward + timed CLOSE.

Differences from the reference (documented):
  - operates on plain pandas DataFrames (flight_id, timestamp, latitude,
    longitude, altitude[, AC Type]) instead of `traffic.Traffic`;
  - groundspeed is derived with a vectorized haversine (the reference uses
    geopy.geodesic per point pair, :102-159 — WGS84 vs sphere differs by
    <0.5%, far below simulator fidelity);
  - the simulator command and working directory are injectable
    (`BlueSkyConfig.command`, `workdir`) so the harness is testable with a
    stub executable and never pip-installs anything at runtime (the
    reference installs bluesky on demand, :20-35).
"""

import glob
import os
import subprocess
from dataclasses import dataclass
from typing import List, Optional

import numpy as np
import pandas as pd

from tvqvae_tpu.data.preprocess import haversine_np

KM_TO_NM = 0.539957


@dataclass
class BlueSkyConfig:
    workdir: str = "./bluesky_eval"
    logs_directory: str = os.path.expanduser("~/bluesky/output")
    command: str = "bluesky --headless --scenfile {scenfile}"
    batch_size: int = 256
    delta: Optional[float] = 1e3  # Douglas-Peucker simplification tolerance
    simulation_time: str = "02:00:00"  # HH:MM:SS
    log_dt: int = 10
    default_ac_type: str = "A319"


def _bearing_deg(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Initial great-circle bearing in degrees (reference :39-77)."""
    lat1, lon1, lat2, lon2 = map(np.radians, (lat1, lon1, lat2, lon2))
    dlon = lon2 - lon1
    y = np.sin(dlon) * np.cos(lat2)
    x = np.cos(lat1) * np.sin(lat2) - np.sin(lat1) * np.cos(lat2) * np.cos(dlon)
    return (np.degrees(np.arctan2(y, x)) + 360.0) % 360.0


def add_ground_speed(df: pd.DataFrame) -> pd.DataFrame:
    """Derive knots groundspeed between consecutive waypoints
    (reference :163-193; first point repeats the first segment speed)."""
    df = df.sort_values("timestamp").copy()
    lat, lon = df["latitude"].to_numpy(), df["longitude"].to_numpy()
    d_nm = haversine_np(lat[:-1], lon[:-1], lat[1:], lon[1:]) * KM_TO_NM
    dt_h = np.diff(df["timestamp"].astype("int64").to_numpy()) / 1e9 / 3600.0
    speed = d_nm / (dt_h + 1e-6)
    df["groundspeed"] = np.concatenate([speed[:1], speed])
    return df


def remove_neighbours(df: pd.DataFrame) -> pd.DataFrame:
    """Drop waypoints repeating the previous coordinates (reference :197-206)."""
    df = df[df["latitude"] != df["latitude"].shift()]
    df = df[df["longitude"] != df["longitude"].shift()]
    return df


def simplify_track(df: pd.DataFrame, tolerance_m: Optional[float]) -> pd.DataFrame:
    """Douglas–Peucker simplification in local meters (the reference calls
    traffic's `.simplify(delta)`, eval_logic.py:362)."""
    if tolerance_m is None or len(df) <= 2:
        return df
    lat = df["latitude"].to_numpy()
    lon = df["longitude"].to_numpy()
    lat0 = float(lat.mean())
    x = np.radians(lon) * 6371000.0 * np.cos(np.radians(lat0))
    y = np.radians(lat) * 6371000.0
    pts = np.stack([x, y], axis=1)

    keep = np.zeros(len(pts), bool)
    keep[0] = keep[-1] = True
    stack = [(0, len(pts) - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 <= i0 + 1:
            continue
        seg = pts[i1] - pts[i0]
        ss = float(seg @ seg)
        w = pts[i0 + 1:i1] - pts[i0]
        if ss == 0.0:
            d = np.linalg.norm(w, axis=1)
        else:
            t = np.clip((w @ seg) / ss, 0.0, 1.0)
            d = np.linalg.norm(w - t[:, None] * seg[None], axis=1)
        k = int(np.argmax(d))
        if d[k] > tolerance_m:
            idx = i0 + 1 + k
            keep[idx] = True
            stack.append((i0, idx))
            stack.append((idx, i1))
    return df.iloc[np.flatnonzero(keep)]


def build_scenario(df: pd.DataFrame, scen_dir: str, ac_type: str) -> str:
    """Write one flight's .scn (reference :209-237): CRE at the first point
    with initial heading/speed, then DEFWPT/ADDWPT per waypoint, LNAV/VNAV,
    and QUIT at the last waypoint."""
    os.makedirs(scen_dir, exist_ok=True)
    fid = str(df.iloc[0]["flight_id"])
    fname = os.path.join(scen_dir, f"output_{fid}.scn")
    first, second = df.iloc[0], df.iloc[1]
    hdg = _bearing_deg(
        first["latitude"], first["longitude"],
        second["latitude"], second["longitude"],
    )
    actype = df.iloc[0].get("AC Type", ac_type) if "AC Type" in df.columns else ac_type
    with open(fname, "w") as f:
        f.write(
            f"00:00:00.00>CRE {fid} {actype} {first['latitude']} "
            f"{first['longitude']} {hdg} {first['altitude']} "
            f"{first['groundspeed']}\n"
        )
        last_wpt = None
        for index, row in df.iloc[1:].iterrows():
            last_wpt = f"WPTZ{index}"
            f.write(
                f"00:00:00.00>DEFWPT {last_wpt},{row['latitude']}, "
                f"{row['longitude']}\n"
            )
            f.write(
                f"00:00:00.00>{fid} ADDWPT {last_wpt} {row['altitude']} "
                f"{row['groundspeed']}\n"
            )
        f.write(f"00:00:00.00>{fid} LNAV ON\n")
        f.write(f"00:00:00.00>{fid} VNAV ON\n")
        f.write(f"00:00:00.00>{fid} AT {last_wpt} QUIT\n")
    return fname


def build_logger(workdir: str, dt: int = 10,
                 variables=("traf.lat", "traf.lon", "traf.alt", "traf.id")) -> str:
    """CRELOG EVALLOG logger scenario (reference :260-271)."""
    fname = os.path.join(workdir, "evaluation_logger.scn")
    with open(fname, "w") as f:
        f.write(f"0:00:00.00>CRELOG EVALLOG {dt}\n")
        f.write(f"0:00:00.00>EVALLOG ADD {' '.join(variables)} \n")
        f.write("0:00:00.00>EVALLOG ON\n")
    return fname


def assemble_scenarios(
    workdir: str, flight_ids: List[str], simulation_time: str,
    logger_scn: str, debug: bool = False,
) -> str:
    """Master scenario: PCALL each flight + the logger, FF, timed CLOSE
    (reference :240-257)."""
    fname = os.path.join(workdir, "evaluation_scenario.scn")
    with open(fname, "w") as f:
        for fid in flight_ids:
            f.write(
                f"00:00:00.00>PCALL "
                f"{os.path.join(workdir, 'scenarios', f'output_{fid}.scn')}\n"
            )
        f.write(f"00:00:00.00>PCALL {logger_scn}\n")
        f.write("00:00:03.00>FF\n")
        end = "00:01:00" if debug else simulation_time
        f.write(f"{end}.00>OP\n")
        f.write(f"{end}.10>CLOSE\n")
    return fname


def logs_to_df(fname: str) -> pd.DataFrame:
    """Parse an EVALLOG csv (reference :279-289)."""
    df = pd.read_csv(
        fname, comment="#",
        names=["relt", "latitude", "longitude", "altitude", "flight_id"],
    )
    return df.sort_values(by=["flight_id", "relt"])


def annotate_logs(logs: pd.DataFrame, original: pd.DataFrame) -> pd.DataFrame:
    """Attach original per-flight metadata + absolute timestamps
    (reference :292-305)."""
    meta = (
        original.sort_values(["flight_id", "timestamp"])
        .drop_duplicates(subset=["flight_id"], keep="first")
        .drop(columns=["altitude", "longitude", "latitude"], errors="ignore")
    )
    logs = logs.copy()
    logs["flight_id"] = logs["flight_id"].astype(str).str.strip()
    meta = meta.copy()
    meta["flight_id"] = meta["flight_id"].astype(str)
    merged = meta.merge(logs, on="flight_id")
    merged["timestamp"] = merged["timestamp"] + pd.to_timedelta(
        merged["relt"], unit="s"
    )
    return merged


def _newest_file(directory: str) -> str:
    files = glob.glob(os.path.join(directory, "*"))
    if not files:
        raise FileNotFoundError(f"no simulator logs in {directory}")
    return max(files, key=os.path.getctime)


def simulate(
    df: pd.DataFrame, cfg: BlueSkyConfig, debug: bool = False
) -> pd.DataFrame:
    """Replay all flights through BlueSky in batches (reference :321-383).

    df: points table with flight_id/timestamp/latitude/longitude/altitude.
    Returns the simulated points annotated with the original metadata.
    """
    os.makedirs(cfg.workdir, exist_ok=True)
    scen_dir = os.path.join(cfg.workdir, "scenarios")
    logger_scn = build_logger(cfg.workdir, cfg.log_dt)

    prepared = []
    for fid, flight in df.groupby("flight_id"):
        flight = flight.sort_values("timestamp")
        # drop runs of grounded duplicates (reference :343-345)
        grounded = (flight["altitude"] == 0) & (
            flight["altitude"].shift(-1) == 0
        )
        flight = flight[~grounded]
        flight = remove_neighbours(flight)
        if len(flight) < 2:
            continue
        flight = add_ground_speed(flight)
        prepared.append(flight)

    out = []
    fids_all = [str(f.iloc[0]["flight_id"]) for f in prepared]
    for s in range(0, len(prepared), cfg.batch_size):
        batch = prepared[s:s + cfg.batch_size]
        fids = []
        for flight in batch:
            sf = simplify_track(flight, cfg.delta)
            if len(sf) < 2:
                sf = flight
            build_scenario(sf, scen_dir, cfg.default_ac_type)
            fids.append(str(sf.iloc[0]["flight_id"]))
        scen = assemble_scenarios(
            cfg.workdir, fids, cfg.simulation_time, logger_scn, debug
        )
        cmd = cfg.command.format(scenfile=scen)
        proc = subprocess.Popen(cmd, shell=True, stdout=subprocess.DEVNULL)
        proc.wait()
        log_file = _newest_file(cfg.logs_directory)
        logs = logs_to_df(log_file)
        out.append(annotate_logs(logs, pd.concat(batch)))
        os.remove(log_file)
    if not out:
        return pd.DataFrame()
    return pd.concat(out, axis=0).reset_index(drop=True)


def clean(workdir: str) -> None:
    """Remove generated scenario files (reference :402-417)."""
    for name in ("evaluation_scenario.scn", "evaluation_logger.scn"):
        try:
            os.remove(os.path.join(workdir, name))
        except OSError:
            pass
    try:
        for f in glob.glob(os.path.join(workdir, "scenarios", "*")):
            os.remove(f)
        os.rmdir(os.path.join(workdir, "scenarios"))
    except OSError as e:
        print(e)
