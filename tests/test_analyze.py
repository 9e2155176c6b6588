"""Analysis CLI test: regenerates the reference's notebook artifact suite
from a dataset + synthetic npz + distances JSON."""

import pytest

pytestmark = pytest.mark.slow

import json
import os

import numpy as np

from tvqvae_tpu.data import make_synthetic_trajectories, save_npz


def test_analyze_cli(tmp_path):
    X, y = make_synthetic_trajectories(n=30, channels=4, length=64)
    data_path = str(tmp_path / "d.npz")
    save_npz(data_path, X, y)

    # "generated" data in original units (analyze re-scales internally)
    Xg = X[:10] + np.random.default_rng(0).normal(0, 0.05, X[:10].shape)
    gen_path = str(tmp_path / "synthetic.npz")
    np.savez_compressed(gen_path, X=Xg.astype(np.float32),
                        y=np.zeros(10, np.int64))

    # distances JSON like evaluate_flyability's output
    rng = np.random.default_rng(1)
    keys = [
        "SSPD Euclidean", "SSPD Spherical", "DTW Euclidean", "DTW Spherical",
        "Hausdorff Euclidean", "Hausdorff Spherical", "LCSS Euclidean",
        "LCSS Spherical", "ERP Euclidean", "ERP Spherical", "EDR Euclidean",
        "EDR Spherical", "Discrete Frechet", "Frechet",
    ]
    dist = {"per_flight": {k: rng.random(10).tolist() for k in keys}}
    dist_path = str(tmp_path / "distances.json")
    with open(dist_path, "w") as f:
        json.dump(dist, f)

    from tvqvae_tpu.scripts import analyze as cli

    save = str(tmp_path / "analysis")
    cli.main([
        "--dataset_file", data_path, "--synthetic_file", gen_path,
        "--distances_json", dist_path, "--save_dir", save,
        "--rocket_num_kernels", "30",
    ])
    for art in [
        "timeseries_ci.png", "distribution_plots.png",
        "visual_inspection.png", "trajectories_generated.png",
        "trajectories_real.png", "altitude_generated.png", "pca.png",
        "tsne.png", "quality_metrics.json",
        "correlation_heatmap_euclidean.png",
        "correlation_heatmap_spherical.png",
        "percentile_plots_euclidean.png", "percentile_plots_spherical.png",
    ]:
        assert os.path.exists(os.path.join(save, art)), art
    with open(os.path.join(save, "quality_metrics.json")) as f:
        res = json.load(f)
    assert all(np.isfinite(res[k]) for k in ("FID", "MDD", "ACD", "SD", "KD"))
