"""Flyability CLI: replay generated trajectories through BlueSky and score
them with the 14-metric trajectory-distance library.

Reference: timevqvae/scripts/evaluate_flyability.py:129-175 (simulation +
truncation at the closest point to the destination) plus the distance
scoring and CDF plots that live in the legacy analysis module
(evaluation/flyability_eval.py:271-411; note that module is dead in the
reference — broken import at :23 — so this CLI unifies both halves).

Input: the generate CLI's synthetic .npz (X in original units with
latitude/longitude/altitude/timedelta channels) or a points CSV/pickle.
Outputs: <name>_simulated.(npz|csv), distance results JSON, CDF plots.
"""

import argparse
import json
import os
from pathlib import Path

import numpy as np
import pandas as pd

from tvqvae_tpu.data.preprocess import airport_latlon, haversine_np
from tvqvae_tpu.evaluation.flyability import (
    BlueSkyConfig,
    calculate_trajectory_distances,
    simulate,
)


def npz_to_points(path: str, features) -> pd.DataFrame:
    """Synthetic npz (X, y) -> flight-points table."""
    z = np.load(path)
    X = z["X"]
    td_idx = features.index("timedelta") if "timedelta" in features else None
    frames = []
    t0 = pd.Timestamp("2020-01-01", tz="utc")
    for i in range(X.shape[0]):
        df = pd.DataFrame({f: X[i, j] for j, f in enumerate(features)})
        rel = X[i, td_idx] if td_idx is not None else np.arange(X.shape[-1])
        df["timestamp"] = t0 + pd.to_timedelta(np.maximum.accumulate(rel), unit="s")
        df["flight_id"] = f"SYN{i:05d}"
        frames.append(df)
    return pd.concat(frames, ignore_index=True)


def longest_non_outlier_duration(points: pd.DataFrame) -> str:
    """IQR-filtered longest flight duration as HH:MM:SS
    (reference evaluate_flyability.py:44-79)."""
    dur = points.groupby("flight_id")["timestamp"].agg(
        lambda s: (s.max() - s.min()).total_seconds()
    )
    q1, q3 = dur.quantile(0.25), dur.quantile(0.75)
    iqr = q3 - q1
    keep = dur[(dur >= q1 - 1.5 * iqr) & (dur <= q3 + 1.5 * iqr)]
    secs = int(keep.max()) if len(keep) else int(dur.max())
    return f"{secs // 3600:02d}:{(secs % 3600) // 60:02d}:{secs % 60:02d}"


def filter_simulated(points: pd.DataFrame, ades_latlon) -> pd.DataFrame:
    """Truncate each simulated flight at its closest point to the
    destination airport (reference evaluate_flyability.py:96-125)."""
    out = []
    for fid, f in points.groupby("flight_id"):
        f = f.sort_values("timestamp").reset_index(drop=True)
        d = haversine_np(
            f["latitude"].to_numpy(), f["longitude"].to_numpy(),
            ades_latlon[0], ades_latlon[1],
        )
        out.append(f.iloc[: int(np.argmin(d)) + 1])
    return pd.concat(out, ignore_index=True)


def score_distances(original: pd.DataFrame, simulated: pd.DataFrame,
                    adep_latlon) -> dict:
    """Per-flight 14-metric distances, aggregated
    (reference flyability_eval.py:271-351). Pairs are scored in vmapped
    shape buckets — one device dispatch per bucket/metric."""
    from tvqvae_tpu.evaluation.flyability.distances import (
        calculate_trajectory_distances_batch,
    )

    sim_ids = set(simulated["flight_id"].unique())
    gens, sims = [], []
    for fid, f in original.groupby("flight_id"):
        if fid not in sim_ids:
            continue
        gen = f.sort_values("timestamp")[["latitude", "longitude"]].to_numpy()
        sim = (
            simulated[simulated["flight_id"] == fid]
            .sort_values("timestamp")[["latitude", "longitude"]]
            .to_numpy()
        )
        if len(gen) < 2 or len(sim) < 2:
            continue
        gens.append(gen)
        sims.append(sim)
    if not gens:
        return {}
    return calculate_trajectory_distances_batch(gens, sims, adep_latlon)


def plot_distance_cdfs(results: dict, out_path: str) -> None:
    """Cumulative-distribution plots per metric
    (reference flyability_eval.py:354-411)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    keys = sorted(results)
    ncol = 4
    nrow = (len(keys) + ncol - 1) // ncol
    fig, axes = plt.subplots(nrow, ncol, figsize=(4 * ncol, 3 * nrow))
    for ax, k in zip(np.ravel(axes), keys):
        vals = np.sort(np.asarray(results[k]))
        ax.plot(vals, np.linspace(0, 1, len(vals)))
        ax.set_title(k, fontsize=9)
        ax.set_ylabel("CDF")
    for ax in np.ravel(axes)[len(keys):]:
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)


def main(argv=None):
    p = argparse.ArgumentParser(description="BlueSky flyability evaluation")
    p.add_argument("--synthetic_file", type=str, required=True,
                   help="generated .npz (or flight-points .csv)")
    p.add_argument("--save_dir", type=str, default="flyability_results")
    p.add_argument("--ADEP", type=str, default="EHAM")
    p.add_argument("--ADES", type=str, default="LIMC")
    p.add_argument("--adep_latlon", type=float, nargs=2, default=None)
    p.add_argument("--ades_latlon", type=float, nargs=2, default=None)
    p.add_argument("--ac_type", type=str, default="A319")
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--bluesky_cmd", type=str,
                   default="bluesky --headless --scenfile {scenfile}")
    p.add_argument("--logs_directory", type=str,
                   default=os.path.expanduser("~/bluesky/output"))
    p.add_argument("--no_score", action="store_true",
                   help="skip the 14-metric distance scoring")
    p.add_argument(
        "--features", type=str, nargs="+",
        default=["latitude", "longitude", "altitude", "timedelta"],
    )
    args = p.parse_args(argv)

    os.makedirs(args.save_dir, exist_ok=True)
    if args.synthetic_file.endswith(".npz"):
        points = npz_to_points(args.synthetic_file, args.features)
    else:
        points = pd.read_csv(args.synthetic_file)
        points["timestamp"] = pd.to_datetime(
            points["timestamp"], utc=True, format="ISO8601"
        )

    adep_ll = airport_latlon(args.ADEP, args.adep_latlon)
    ades_ll = airport_latlon(args.ADES, args.ades_latlon)

    cfg = BlueSkyConfig(
        workdir=os.path.join(args.save_dir, "bluesky_work"),
        logs_directory=args.logs_directory,
        command=args.bluesky_cmd,
        batch_size=args.batch_size,
        simulation_time=longest_non_outlier_duration(points),
        default_ac_type=args.ac_type,
    )
    print(f"[flyability] simulating {points['flight_id'].nunique()} flights "
          f"(simulation_time={cfg.simulation_time})")
    simulated = simulate(points, cfg)
    simulated = filter_simulated(simulated, ades_ll)

    stem = Path(args.synthetic_file).stem
    sim_path = os.path.join(args.save_dir, f"{stem}_simulated.csv")
    simulated.to_csv(sim_path, index=False)
    print(f"[flyability] simulated tracks -> {sim_path}")

    if not args.no_score:
        results = score_distances(points, simulated, adep_ll)
        summary = {
            k: {"mean": float(np.mean(v)), "median": float(np.median(v)),
                "p90": float(np.percentile(v, 90))}
            for k, v in results.items()
        }
        with open(os.path.join(args.save_dir, f"{stem}_distances.json"), "w") as f:
            json.dump({"per_flight": results, "summary": summary}, f, indent=2)
        plot_distance_cdfs(
            results, os.path.join(args.save_dir, f"{stem}_distance_cdfs.png")
        )
        print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
