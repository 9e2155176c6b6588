"""Generate CLI: sample synthetic trajectories from trained checkpoints.

Reference: timevqvae/scripts/generate.py:44-156 — per-class conditional
sampling matched to the real class distribution, inverse MinMax transform,
timedelta[0] := 0, altitude clipped at >= 0, synthetic timestamps, exported
as a traffic pickle; run twice (raw and fidelity-enhanced outputs).

This CLI always writes the framework-native .npz (X in original units, y);
when the optional `traffic` library is importable it additionally writes the
reference-compatible Traffic pickle.
"""

import argparse
import os
from pathlib import Path

import numpy as np

from tvqvae_tpu.config import Config
from tvqvae_tpu.data import get_data
from tvqvae_tpu.generation import TrainedModelSampler


def postprocess_generated(
    X_gen: np.ndarray,
    scaler,
    features,
    altitude_idx=None,
    timedelta_idx=None,
) -> np.ndarray:
    """Inverse scaling + physical-validity fixes (reference generate.py:14-41;
    note the reference hardcodes timedelta as column 3 — here resolved from
    the feature list)."""
    N, C, L = X_gen.shape
    flat = X_gen.transpose(0, 2, 1).reshape(N, L * C)
    flat = scaler.inverse_transform(flat)
    X = flat.reshape(N, L, C).transpose(0, 2, 1)
    if altitude_idx is None and "altitude" in features:
        altitude_idx = features.index("altitude")
    if timedelta_idx is None and "timedelta" in features:
        timedelta_idx = features.index("timedelta")
    if altitude_idx is not None:
        X[:, altitude_idx] = np.clip(X[:, altitude_idx], 0.0, None)
    if timedelta_idx is not None:
        X[:, timedelta_idx, 0] = 0.0
    return X


def export_traffic_pickle(path: str, X: np.ndarray, y: np.ndarray, features):
    """Write a reference-compatible traffic.Traffic pickle (synthetic
    timestamps from the timedelta channel; reference generate.py:14-41)."""
    try:
        import pandas as pd
        from traffic.core import Traffic
    except ImportError:
        print("[generate] `traffic` not installed; skipped Traffic pickle")
        return False
    frames = []
    t0 = pd.Timestamp("2020-01-01", tz="utc")
    td_idx = features.index("timedelta") if "timedelta" in features else None
    for i in range(X.shape[0]):
        df = pd.DataFrame({f: X[i, j] for j, f in enumerate(features)})
        if td_idx is not None:
            df["timestamp"] = t0 + pd.to_timedelta(
                np.cumsum(X[i, td_idx]), unit="s"
            )
        else:
            df["timestamp"] = t0 + pd.to_timedelta(
                np.arange(X.shape[-1]), unit="s"
            )
        df["flight_id"] = f"synthetic_{i}"
        df["callsign"] = f"SYN{i:05d}"
        df["icao24"] = f"{i:06x}"
        df["cluster"] = int(y[i])
        frames.append(df)
    Traffic(pd.concat(frames)).to_pickle(path)
    return True


def generate_synthetic_data(
    cfg, sampler, data, n_samples, save_dir, features, seed=0, tag=""
):
    os.makedirs(save_dir, exist_ok=True)
    # per-class counts matched to the real class distribution
    # (reference generate.py:96-112)
    counts = np.bincount(
        np.concatenate([data.y_train[:, 0], data.y_test[:, 0]]),
        minlength=data.n_classes,
    )
    total = counts.sum()
    Xs, ys = [], []
    for cls in range(data.n_classes):
        n_cls = int(round(n_samples * counts[cls] / max(total, 1)))
        if n_cls == 0:
            continue
        _, _, x = sampler.sample(
            n_cls, "conditional", class_index=cls, seed=seed + cls
        )
        Xs.append(x)
        ys.append(np.full(n_cls, cls, np.int64))
    X = np.concatenate(Xs)
    y = np.concatenate(ys)
    X = postprocess_generated(X, data.scaler, features)

    npz_path = os.path.join(save_dir, f"synthetic{tag}.npz")
    np.savez_compressed(npz_path, X=X.astype(np.float32), y=y)
    export_traffic_pickle(
        os.path.join(save_dir, f"synthetic{tag}.pkl"), X, y, features
    )
    print(f"[generate] wrote {X.shape[0]} trajectories -> {npz_path}")
    return X, y


def main(argv=None):
    p = argparse.ArgumentParser(description="Generate synthetic trajectories")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--dataset_file", type=str, required=True)
    p.add_argument("--model_save_dir", type=str, default="saved_models")
    p.add_argument("--synthetic_save_dir", type=str, default="synthetic_data")
    p.add_argument("--synthetic_fidelity_dir", type=str,
                   default="synthetic_data_fidelity")
    p.add_argument("--n_samples", type=int, default=None,
                   help="default: size of the real dataset")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true",
                   help="run the frozen decode conv stacks (and FE) in "
                        "bfloat16 — halves decode HBM traffic")
    p.add_argument("--fast_bn", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="BN normalization in the compute dtype (default ON "
                        "to match training since round 3; identical math "
                        "at fp32 — --no-fast_bn opts out)")
    args = p.parse_args(argv)

    cfg = Config.from_yaml(args.config) if args.config else Config()
    data = get_data(args.dataset_file, cfg.dataset.features,
                    scale=cfg.dataset.data_scaling)
    stem = Path(args.dataset_file).stem
    ckpt = os.path.join(args.model_save_dir, stem)
    n = args.n_samples or (len(data.X_train) + len(data.X_test))

    # run twice like the reference (generate.py:148-156): raw, then FE
    dt = "bfloat16" if args.bf16 else "float32"
    sampler = TrainedModelSampler(
        cfg, os.path.join(ckpt, "stage1"), os.path.join(ckpt, "stage2"),
        batch_size=args.batch_size, compute_dtype=dt, fast_bn=args.fast_bn,
    )
    generate_synthetic_data(
        cfg, sampler, data, n, args.synthetic_save_dir,
        cfg.dataset.features, seed=args.seed,
    )

    stage3 = os.path.join(ckpt, "stage3")
    if os.path.exists(stage3):
        sampler_fe = TrainedModelSampler(
            cfg, os.path.join(ckpt, "stage1"), os.path.join(ckpt, "stage2"),
            stage3, use_fidelity_enhancer=True, batch_size=args.batch_size,
            compute_dtype=dt, fast_bn=args.fast_bn,
        )
        generate_synthetic_data(
            cfg, sampler_fe, data, n, args.synthetic_fidelity_dir,
            cfg.dataset.features, seed=args.seed, tag="_fe",
        )
    else:
        print("[generate] no stage3 checkpoint; skipped FE output")


if __name__ == "__main__":
    main()
