"""Full-pipeline integration test: 3-stage training -> checkpoints ->
sampler -> generation + SVQ reconstruction + tau search, all on the virtual
CPU mesh with a tiny synthetic dataset. This is the end-to-end path the
reference exercises via `make train` + `make generate` (SURVEY.md §3.1-3.2).
"""

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import pytest

import jax

from tvqvae_tpu.config import Config
from tvqvae_tpu.data import get_data, make_synthetic_trajectories, save_npz
from tvqvae_tpu.evaluation import Metrics
from tvqvae_tpu.generation import TrainedModelSampler, search_optimal_tau
from tvqvae_tpu.train import runner


@pytest.fixture(scope="module")
def tiny_cfg():
    return Config.from_dict(
        {
            "dataset": {"batch_sizes": {"stage1": 16, "stage2": 8, "stage3": 8}},
            "exp_params": {"lr": 2e-3, "linear_warmup_rate": 0.1},
            "trainer_params": {
                "max_steps": {"stage1": 20, "stage2": 15, "stage3": 10},
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
                                  "p_unconditional": 0.2,
                                  "model_dropout": 0.1, "emb_dropout": 0.1},
                "prior_model_h": {"hidden_dim": 16, "n_layers": 1, "heads": 1,
                                  "ff_mult": 1, "use_rmsnorm": True,
                                  "p_unconditional": 0.2,
                                  "model_dropout": 0.1, "emb_dropout": 0.1},
            },
            "fidelity_enhancer": {"dim": 8, "dim_mults": [1, 2],
                                  "resnet_block_groups": 4, "dropout": 0.1,
                                  "tau_search_rng": [0.5, 2],
                                  "percept_loss_weight": 0.0},
            "evaluation": {"batch_size": 16, "min_num_gen_samples": 16,
                           "feature_extractor_type": "rocket"},
        }
    )


def test_full_pipeline(tiny_cfg, tmp_path):
    cfg = tiny_cfg
    X, y = make_synthetic_trajectories(n=48, channels=2, length=96)
    data_path = str(tmp_path / "tiny.npz")
    save_npz(data_path, X, y)
    data = get_data(data_path, ["a", "b"])

    p1 = str(tmp_path / "stage1")
    p2 = str(tmp_path / "stage2")
    p3 = str(tmp_path / "stage3")
    pf = str(tmp_path / "fcn")

    runner.train_stage1(cfg, data, p1, max_steps=20)
    runner.train_stage2(cfg, data, p1, p2, max_steps=15)
    runner.train_stage3(cfg, data, p1, p3, max_steps=10)
    runner.train_fcn(cfg, data, pf, max_epochs=20, batch_size=16)

    # --- sampling without FE ---
    sampler = TrainedModelSampler(cfg, p1, p2, batch_size=8)
    x_l, x_h, x = sampler.sample(12, "unconditional", seed=0)
    assert x.shape == (12, data.in_channels, data.input_length)
    assert np.isfinite(x).all()
    np.testing.assert_allclose(x, x_l + x_h, atol=1e-5)

    # conditional sampling per class
    x_l, x_h, xc = sampler.sample(6, "conditional", class_index=0, seed=1)
    assert xc.shape[0] == 6 and np.isfinite(xc).all()

    # --- sampling with FE ---
    sampler_fe = TrainedModelSampler(
        cfg, p1, p2, p3, use_fidelity_enhancer=True, batch_size=8
    )
    _, _, x_fe = sampler_fe.sample(8, "unconditional", seed=0)
    assert x_fe.shape == (8, data.in_channels, data.input_length)
    assert np.isfinite(x_fe).all()

    # stage-1 reconstruction (deterministic + SVQ-stochastic)
    rec = sampler.reconstruct(data.X_train[:8])
    assert rec.shape == (8, data.in_channels, data.input_length)
    rec2 = sampler.reconstruct(data.X_train[:8])
    np.testing.assert_array_equal(rec, rec2)
    svq_a = sampler.reconstruct(data.X_train[:8], svq_temp=3.0, seed=0)
    svq_b = sampler.reconstruct(data.X_train[:8], svq_temp=3.0, seed=9)
    assert not np.allclose(svq_a, svq_b)

    # FE standalone enhancement
    enh = sampler_fe.enhance(rec)
    assert enh.shape == rec.shape

    # --- metrics + tau search over the real path ---
    metrics = Metrics(
        data.input_length, data.in_channels, data.n_classes, 16,
        data.X_train, data.X_test,
        feature_extractor_type="rocket", rocket_num_kernels=30,
    )
    z_gen = metrics.z_gen_fn(x)
    fid = metrics.fid_score(metrics.z_test, z_gen)
    assert np.isfinite(fid)
    mdd, acd, sd, kd = metrics.stat_metrics(data.X_test, x)
    assert all(np.isfinite([mdd, acd, sd, kd]))

    tau = search_optimal_tau(
        cfg, sampler, metrics, data.X_train[:16], n_samples=8
    )
    assert tau in (0.5, 2)

    # --- serving layer over the REAL sampler (HTTP end-to-end) ---
    import json
    import threading
    from http.client import HTTPConnection

    from tvqvae_tpu.serving import GenerationService, make_server

    svc = GenerationService(
        sampler, scaler=data.scaler, features=["a", "b"], max_request=32
    )
    srv = make_server(svc, "127.0.0.1", 0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        conn = HTTPConnection("127.0.0.1", srv.server_address[1], timeout=120)
        conn.request(
            "POST", "/v1/generate",
            body=json.dumps({"n": 4, "class_index": 0, "seed": 5}).encode(),
            headers={"Content-Type": "application/json"},
        )
        resp = conn.getresponse()
        assert resp.status == 200
        out = json.loads(resp.read())
        served = np.asarray(out["X"])
        assert served.shape == (4, data.in_channels, data.input_length)
        assert np.isfinite(served).all()
        conn.close()
    finally:
        srv.shutdown()
        srv.server_close()

    # --- FCN-based IS through the engine ---
    from tvqvae_tpu.train.runner import load_fcn_bundle

    fcn_vars, _ = load_fcn_bundle(pf)
    m_fcn = Metrics(
        data.input_length, data.in_channels, data.n_classes, 16,
        data.X_train[:16], data.X_test,
        feature_extractor_type="supervised_fcn",
        fcn_variables={"params": fcn_vars["params"],
                       "batch_stats": fcn_vars["batch_stats"]},
    )
    is_mean, is_std = m_fcn.inception_score(x)
    assert np.isfinite(is_mean)
