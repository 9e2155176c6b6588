"""CLI surface tests: train -> generate -> evaluate wired end to end on a
tiny synthetic dataset (reference Makefile workflow, SURVEY.md §1 L6)."""

import pytest

pytestmark = pytest.mark.slow

import json
import os

import numpy as np
import pytest
import yaml

from tvqvae_tpu.data import make_synthetic_trajectories, save_npz


TINY_YAML = {
    "dataset": {
        "features": ["latitude", "longitude", "altitude", "timedelta"],
        "data_scaling": True,
        "batch_sizes": {"stage1": 16, "stage2": 8, "stage3": 8},
    },
    "exp_params": {"lr": 2e-3, "linear_warmup_rate": 0.1},
    "trainer_params": {
        "max_steps": {"stage1": 12, "stage2": 8, "stage3": 6},
        "val_check_interval": {"stage1": 10, "stage2": 10, "stage3": 5},
    },
    "encoder": {"init_dim": 4, "hid_dim": 16, "n_resnet_blocks": 1,
                "downsampled_width": {"lf": 4, "hf": 8}},
    "decoder": {"n_resnet_blocks": 1},
    "VQ-VAE": {"n_fft": 4, "codebook_sizes": {"lf": 8, "hf": 8}},
    "MaskGIT": {
        "choice_temperatures": {"lf": 10, "hf": 4},
        "T": {"lf": 3, "hf": 1},
        "cfg_scale": 1.0,
        "prior_model_l": {"hidden_dim": 16, "n_layers": 1, "heads": 2,
                          "ff_mult": 1, "use_rmsnorm": True,
                          "p_unconditional": 0.2, "model_dropout": 0.1,
                          "emb_dropout": 0.1},
        "prior_model_h": {"hidden_dim": 16, "n_layers": 1, "heads": 1,
                          "ff_mult": 1, "use_rmsnorm": True,
                          "p_unconditional": 0.2, "model_dropout": 0.1,
                          "emb_dropout": 0.1},
    },
    "fidelity_enhancer": {"dim": 8, "dim_mults": [1, 2],
                          "resnet_block_groups": 4, "dropout": 0.1,
                          "tau_search_rng": [0.5, 2],
                          "percept_loss_weight": 0.0},
    "evaluation": {"batch_size": 8, "min_num_gen_samples": 8,
                   "feature_extractor_type": "rocket"},
    "logger": {"mlflow_uri": None, "experiment_name": "tiny"},
}


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("cli")
    X, y = make_synthetic_trajectories(n=40, channels=4, length=96)
    data_path = str(ws / "route.npz")
    save_npz(data_path, X, y)
    cfg_path = str(ws / "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(TINY_YAML, f)
    return ws, data_path, cfg_path


def test_train_generate_evaluate_cli(workspace):
    ws, data_path, cfg_path = workspace
    models = str(ws / "saved_models")
    runs = str(ws / "runs")

    from tvqvae_tpu.scripts import evaluate as evaluate_cli
    from tvqvae_tpu.scripts import generate as generate_cli
    from tvqvae_tpu.scripts import train as train_cli
    from tvqvae_tpu.scripts import train_fcn as train_fcn_cli

    train_cli.main([
        "--config", cfg_path, "--dataset_file", data_path,
        "--stage", "all", "--model_save_dir", models, "--run_dir", runs,
    ])
    for stage in ("stage1", "stage2", "stage3"):
        assert os.path.exists(os.path.join(models, "route", stage))
        assert os.path.exists(os.path.join(models, "route", stage + ".meta.json"))

    train_fcn_cli.main([
        "--dataset_file", data_path, "--model_save_dir", models,
        "--run_dir", runs, "--max_steps", "15", "--batch_size", "16",
    ])
    assert os.path.exists(os.path.join(models, "route", "fcn"))

    gen_dir = str(ws / "synthetic")
    gen_fe_dir = str(ws / "synthetic_fe")
    generate_cli.main([
        "--config", cfg_path, "--dataset_file", data_path,
        "--model_save_dir", models,
        "--synthetic_save_dir", gen_dir,
        "--synthetic_fidelity_dir", gen_fe_dir,
        "--n_samples", "12", "--batch_size", "8",
    ])
    z = np.load(os.path.join(gen_dir, "synthetic.npz"))
    assert z["X"].shape[1:] == (4, 96)
    assert z["X"].shape[0] >= 10
    # inverse scaling: generated values live in original units, altitude >= 0
    assert z["X"][:, 2].min() >= 0.0
    # timedelta starts at 0
    assert np.allclose(z["X"][:, 3, 0], 0.0)
    z_fe = np.load(os.path.join(gen_fe_dir, "synthetic_fe.npz"))
    assert z_fe["X"].shape[1:] == (4, 96)

    evaluate_cli.main([
        "--config", cfg_path, "--dataset_file", data_path,
        "--model_save_dir", models, "--run_dir", runs,
        "--min_num_gen_samples", "8",
    ])
    metrics_file = os.path.join(runs, "route_evaluate", "metrics.jsonl")
    with open(metrics_file) as f:
        rec = json.loads(f.readlines()[-1])
    for key in ("FID", "MDD", "ACD", "SD", "KD", "FID with FE", "IS_mean"):
        assert key in rec, key
        assert np.isfinite(rec[key])
    # artifacts written
    run_dir = os.path.join(runs, "route_evaluate")
    for art in ("visual_inspection.png", "pca_test_gen.png",
                "tsne_test_gen.png", "conditional_class_0.png"):
        assert os.path.exists(os.path.join(run_dir, art))
