"""Preprocess CLI: raw EuroControl/OpenSky CSVs -> training tensors.

Reference: timevqvae/scripts/preprocess.py:482-538 (same flags: --ADEP,
--ADES, --raw_data_dir, --data_source, --save_dir; extra: explicit airport
coordinate overrides for environments without the traffic airport DB).
Outputs <save_dir>/<source>_<ADEP>_<ADES>.npz (+ .pkl when `traffic` is
installed).
"""

import argparse
import os

from tvqvae_tpu.data.preprocess import (
    airport_latlon,
    export_dataset,
    load_eurocontrol,
    load_opensky,
    prepare_trajectories,
)


def main(argv=None):
    p = argparse.ArgumentParser(description="Preprocess raw ADS-B data")
    p.add_argument("--ADEP", type=str, default="EHAM")
    p.add_argument("--ADES", type=str, default="LIMC")
    p.add_argument("--raw_data_dir", dest="base_path", type=str,
                   default="../raw_data/")
    p.add_argument("--data_source", type=str, default="EuroControl")
    p.add_argument("--save_dir", type=str, default="./data/real/")
    p.add_argument("--adep_latlon", type=float, nargs=2, default=None)
    p.add_argument("--ades_latlon", type=float, nargs=2, default=None)
    p.add_argument("--n_clusters", type=int, default=5)
    p.add_argument("--n_samples", type=int, default=None,
                   help="override the resample length (default: even-forced "
                        "average sequence length)")
    args = p.parse_args(argv)

    src = args.data_source.lower()
    if "eurocontrol" in src:
        df, avg_len = load_eurocontrol(
            os.path.join(args.base_path, "EuroControl"), args.ADEP, args.ADES
        )
        # en-route outlier filtering also applies to EuroControl points
        from tvqvae_tpu.data.preprocess import remove_outliers

        df, avg_len2 = remove_outliers(
            df,
            airport_latlon(args.ADEP, args.adep_latlon),
            airport_latlon(args.ADES, args.ades_latlon),
        )
        avg_len = avg_len2 or avg_len
    elif "opensky" in src:
        df, avg_len = load_opensky(
            os.path.join(args.base_path, "OpenSky"), args.ADEP, args.ADES,
            adep_latlon=args.adep_latlon, ades_latlon=args.ades_latlon,
        )
    else:
        raise ValueError(
            f"Invalid data source: {args.data_source} "
            "(EuroControl and OpenSky are supported)"
        )

    n = args.n_samples or avg_len
    X, labels, ids = prepare_trajectories(df, n, n_clusters=args.n_clusters)

    os.makedirs(args.save_dir, exist_ok=True)
    base = os.path.join(
        args.save_dir, f"{args.data_source}_{args.ADEP}_{args.ADES}"
    )
    out = export_dataset(base, X, labels, ids)
    print(f"Saved {X.shape[0]} trajectories of shape {X.shape[1:]} -> {out}")


if __name__ == "__main__":
    main()
