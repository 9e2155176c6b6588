"""Analysis CLI: the reference's notebook suite as reproducible commands.

The reference's acceptance checks live in six notebooks
(notebooks/{Quality_Statistical_metrics, pca_tsne, time_series,
distribution_plots, correlation_heatmaps, trajectories_distances}.ipynb —
SURVEY.md §4). This CLI regenerates the same artifact set from the real
dataset + a generated .npz (+ optionally a flyability distances JSON):

  - time-series CI bands per channel        (time_series.ipynb)
  - marginal distribution histograms        (distribution_plots.ipynb)
  - trajectory / altitude overlays          (plot_utils)
  - PCA + t-SNE of feature embeddings       (pca_tsne.ipynb)
  - FID / IS / MDD / ACD / SD / KD          (Quality_Statistical_metrics.ipynb)
  - distance correlation heatmaps +
    percentile plots (euclidean/spherical)  (correlation_heatmaps.ipynb,
                                             trajectories_distances.ipynb)
"""

import argparse
import json
import os

import numpy as np

from tvqvae_tpu.config import Config
from tvqvae_tpu.data import get_data
from tvqvae_tpu.evaluation import Metrics
from tvqvae_tpu.utils import plots


def main(argv=None):
    p = argparse.ArgumentParser(description="Analysis figure suite")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--dataset_file", type=str, required=True)
    p.add_argument("--synthetic_file", type=str, required=True,
                   help="generated .npz in ORIGINAL units (generate CLI "
                        "output); will be re-scaled with the dataset scaler")
    p.add_argument("--distances_json", type=str, default=None,
                   help="optional flyability distances JSON for heatmaps/"
                        "percentiles")
    p.add_argument("--save_dir", type=str, default="analysis")
    p.add_argument("--rocket_num_kernels", type=int, default=1000)
    args = p.parse_args(argv)

    cfg = Config.from_yaml(args.config) if args.config else Config()
    os.makedirs(args.save_dir, exist_ok=True)
    data = get_data(args.dataset_file, cfg.dataset.features,
                    scale=cfg.dataset.data_scaling)

    z = np.load(args.synthetic_file)
    X_gen_raw = np.asarray(z["X"], np.float32)
    # generated data is exported in original units; bring it back into the
    # scaled space the models/metrics operate in
    N, C, L = X_gen_raw.shape
    flat = X_gen_raw.transpose(0, 2, 1).reshape(N, L * C)
    X_gen = (
        data.scaler.transform(flat).reshape(N, L, C).transpose(0, 2, 1)
        .astype(np.float32)
    )

    feats = cfg.dataset.features
    save = lambda fig, name: fig.savefig(
        os.path.join(args.save_dir, name), bbox_inches="tight"
    )

    save(plots.plot_timeseries_ci(data.X_test, X_gen, feats),
         "timeseries_ci.png")
    save(plots.plot_distributions(data.X_test, X_gen, feats),
         "distribution_plots.png")
    save(plots.plot_visual_inspection(data.X_test, X_gen),
         "visual_inspection.png")
    if {"latitude", "longitude"} <= set(feats):
        la, lo = feats.index("latitude"), feats.index("longitude")
        save(plots.plot_trajectories(X_gen, la, lo, title="generated"),
             "trajectories_generated.png")
        save(plots.plot_trajectories(data.X_test, la, lo, title="real"),
             "trajectories_real.png")
        save(plots.plot_clustering(data.X_test, data.y_test, la, lo,
                                   title="real trajectories per class"),
             "clustering_real.png")
        if "altitude" in feats:
            save(plots.plot_altitude_map(X_gen, la, lo,
                                         feats.index("altitude"),
                                         title="generated altitude"),
                 "altitude_map_generated.png")
    if "altitude" in feats:
        save(plots.plot_altitude(X_gen, feats.index("altitude")),
             "altitude_generated.png")

    # feature-space metrics + embeddings (Quality_Statistical_metrics.ipynb)
    metrics = Metrics(
        data.input_length, data.in_channels, data.n_classes,
        cfg.evaluation.batch_size, data.X_train, data.X_test,
        feature_extractor_type="rocket",
        rocket_num_kernels=args.rocket_num_kernels,
    )
    z_gen = metrics.z_gen_fn(X_gen)
    results = {"FID": metrics.fid_score(metrics.z_test, z_gen)}
    mdd, acd, sd, kd = metrics.stat_metrics(data.X_test, X_gen)
    results.update({"MDD": mdd, "ACD": acd, "SD": sd, "KD": kd})
    save(plots.plot_pca([metrics.z_test, z_gen], ["Z_test", "Z_gen"]),
         "pca.png")
    save(plots.plot_tsne([metrics.z_test, z_gen], ["Z_test", "Z_gen"]),
         "tsne.png")
    with open(os.path.join(args.save_dir, "quality_metrics.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))

    # distance-metric analyses (correlation_heatmaps / trajectories_distances)
    if args.distances_json:
        with open(args.distances_json) as f:
            dist = json.load(f)["per_flight"]
        eucl = [k for k in dist if "Euclidean" in k] + ["Discrete Frechet", "Frechet"]
        sph = [k for k in dist if "Spherical" in k]
        save(plots.plot_metric_correlation_heatmap(
            dist, eucl, "distance correlations (euclidean)"),
            "correlation_heatmap_euclidean.png")
        save(plots.plot_metric_correlation_heatmap(
            dist, sph, "distance correlations (spherical)"),
            "correlation_heatmap_spherical.png")
        save(plots.plot_metric_percentiles(
            dist, eucl, "distance percentiles (euclidean)"),
            "percentile_plots_euclidean.png")
        save(plots.plot_metric_percentiles(
            dist, sph, "distance percentiles (spherical)"),
            "percentile_plots_spherical.png")

    print(f"[analyze] artifacts in {args.save_dir}")


if __name__ == "__main__":
    main()
