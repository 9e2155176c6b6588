"""Landing-trajectory preprocess CLI: chunked OpenSky CSV -> final-approach
tensors.

Reference: timevqvae/scripts/preprocess_landing.py:208-395 — chunked CSV
reading, flight-id assignment, truncation to points within 100 km of the
destination airport, landing-specific outlier thresholds (final distance
10 km, short-sequence z > -1), clustering + resampling, saved as
landing_<ADES>.
"""

import argparse
import glob
import os

import pandas as pd

from tvqvae_tpu.data.preprocess import (
    airport_latlon,
    assign_flight_ids,
    export_dataset,
    haversine_np,
    prepare_trajectories,
    remove_outliers,
)


def get_landing_data(df: pd.DataFrame, ades_latlon, distance_km: float = 100.0):
    """Keep only points within distance_km of the destination
    (reference preprocess_landing.py:279-291)."""
    d = haversine_np(
        df["latitude"].to_numpy(), df["longitude"].to_numpy(),
        ades_latlon[0], ades_latlon[1],
    )
    return df[d <= distance_km]


def process_chunk(chunk: pd.DataFrame, ades_latlon, distance_km: float):
    """Reference preprocess_landing.py:257-277."""
    chunk = chunk.dropna()
    chunk = chunk[chunk["altitude"] >= 0]
    chunk = chunk.copy()
    chunk["timestamp"] = pd.to_datetime(chunk["timestamp"], utc=True, format="ISO8601")
    chunk = chunk.sort_values("timestamp")
    chunk = assign_flight_ids(chunk, window_hours=6)
    return get_landing_data(chunk, ades_latlon, distance_km)


def main(argv=None):
    p = argparse.ArgumentParser(description="Preprocess landing trajectories")
    p.add_argument("--ADES", type=str, default="ENGM")
    p.add_argument("--raw_data_dir", dest="base_path", type=str,
                   default="../raw_data")
    p.add_argument("--save_dir", type=str, default="./data/real/")
    p.add_argument("--ades_latlon", type=float, nargs=2, default=None)
    p.add_argument("--chunk_size", type=int, default=15_000_000)
    p.add_argument("--n_clusters", type=int, default=5)
    p.add_argument("--n_samples", type=int, default=None)
    args = p.parse_args(argv)

    ades_ll = airport_latlon(args.ADES, args.ades_latlon)
    files = [
        f for f in glob.glob(os.path.join(args.base_path, "landing", "*.csv"))
        if args.ADES in os.path.basename(f)
    ]
    assert files, f"no landing csv for {args.ADES}"

    frames = []
    for chunk in pd.read_csv(files[0], chunksize=args.chunk_size):
        frames.append(process_chunk(chunk, ades_ll, distance_km=100.0))
    df = pd.concat(frames).dropna()

    # landing-specific thresholds: final distance 10 km, short-seq z > -1,
    # no initial-distance rule (reference preprocess_landing.py:121-126,
    # 248-250)
    df, avg_len = remove_outliers(
        df, adep_latlon=None, ades_latlon=ades_ll,
        airport_km=10.0, short_seq_z=-1.0,
    )
    n = args.n_samples or avg_len
    X, labels, ids = prepare_trajectories(df, n, n_clusters=args.n_clusters)

    os.makedirs(args.save_dir, exist_ok=True)
    base = os.path.join(args.save_dir, f"landing_{args.ADES}")
    out = export_dataset(base, X, labels, ids)
    print(f"Saved {X.shape[0]} landing trajectories of shape {X.shape[1:]} -> {out}")


if __name__ == "__main__":
    main()
