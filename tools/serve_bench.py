"""Serving-path benchmark: request latency + throughput through the real
service stack (GenerationService -> sampler -> device), with and without
the HTTP layer.

Methodology matches bench.py: numpy host materialization of the response is
the drain (an HTTP response body cannot be faked by an async completion
signal — the bytes exist), chunked percentiles reported. Run on the chip:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/serve_bench.py \
        --ckpt /tmp/fullrun/models [--n 32] [--reqs 20]

Without --ckpt it builds a tiny CPU model first (sanity mode).
"""

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get(
                      "JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".cache", "jax")))


def pct(xs):
    return {
        "p50_ms": float(np.percentile(xs, 50)),
        "p10_ms": float(np.percentile(xs, 10)),
        "p90_ms": float(np.percentile(xs, 90)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None,
                    help="model dir with stage1/ stage2/ (e.g. the full-run "
                         "workdir); default: train a tiny CPU model")
    ap.add_argument("--config", default=None)
    ap.add_argument("--n", type=int, default=32,
                    help="trajectories per request")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--reqs", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu or args.ckpt is None:
        jax.config.update("jax_platforms", "cpu")

    from tvqvae_tpu.config import Config
    from tvqvae_tpu.generation import TrainedModelSampler
    from tvqvae_tpu.serving import GenerationService, make_server

    if args.ckpt is None:
        # tiny sanity model (mirrors tests/test_pipeline.py shapes)
        import tempfile

        from tvqvae_tpu.data import (
            get_data,
            make_synthetic_trajectories,
            save_npz,
        )
        from tvqvae_tpu.train import runner

        cfg = Config.from_dict({
            "dataset": {"batch_sizes": {"stage1": 16, "stage2": 8}},
            "trainer_params": {"max_steps": {"stage1": 5, "stage2": 5},
                               "val_check_interval": {"stage1": 100,
                                                      "stage2": 100}},
            "encoder": {"init_dim": 4, "hid_dim": 16, "n_resnet_blocks": 1,
                        "downsampled_width": {"lf": 4, "hf": 8}},
            "decoder": {"n_resnet_blocks": 1},
            "VQ-VAE": {"n_fft": 4, "codebook_sizes": {"lf": 8, "hf": 8}},
            "MaskGIT": {
                "choice_temperatures": {"lf": 10, "hf": 4},
                "T": {"lf": 3, "hf": 1}, "cfg_scale": 1.0,
                "prior_model_l": {"hidden_dim": 16, "n_layers": 1,
                                  "heads": 2, "ff_mult": 1},
                "prior_model_h": {"hidden_dim": 16, "n_layers": 1,
                                  "heads": 1, "ff_mult": 1},
            },
        })
        wd = tempfile.mkdtemp(prefix="servebench_")
        d = os.path.join(wd, "d.npz")
        X, y = make_synthetic_trajectories(n=32, channels=4, length=96,
                                           n_classes=3, seed=5)
        save_npz(d, X, y)
        data = get_data(d, ["a", "b", "c", "d"])
        p1, p2 = os.path.join(wd, "stage1"), os.path.join(wd, "stage2")
        runner.train_stage1(cfg, data, p1, max_steps=5)
        runner.train_stage2(cfg, data, p1, p2, max_steps=5)
        ckpt1, ckpt2 = p1, p2
    else:
        cfg = Config.from_yaml(args.config) if args.config else Config()
        ckpt1 = os.path.join(args.ckpt, "stage1")
        ckpt2 = os.path.join(args.ckpt, "stage2")

    sampler = TrainedModelSampler(cfg, ckpt1, ckpt2, batch_size=args.batch)
    svc = GenerationService(sampler)
    t0 = time.perf_counter()
    svc.warmup()
    print(f"[serve_bench] warmup {time.perf_counter() - t0:.1f}s", flush=True)

    # --- direct service path (no HTTP) --------------------------------
    lat = []
    for i in range(args.reqs):
        t0 = time.perf_counter()
        Xr, _ = svc.generate(args.n, seed=i)
        assert np.isfinite(Xr).all()  # host materialization == drain
        lat.append((time.perf_counter() - t0) * 1e3)
    direct = pct(lat)

    # --- through HTTP --------------------------------------------------
    import http.client

    srv = make_server(svc, "127.0.0.1", 0)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    port = srv.server_address[1]
    body = json.dumps({"n": args.n, "format": "npz"}).encode()
    lat_http = []
    try:
        for i in range(args.reqs):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            t0 = time.perf_counter()
            conn.request("POST", "/v1/generate", body=body,
                         headers={"Content-Type": "application/json"})
            resp = conn.getresponse()
            blob = resp.read()
            lat_http.append((time.perf_counter() - t0) * 1e3)
            assert resp.status == 200 and len(blob) > 0
            conn.close()
    finally:
        srv.shutdown()
        srv.server_close()
    http_ = pct(lat_http)

    out = {
        "n_per_request": args.n,
        "requests": args.reqs,
        "direct": direct,
        "http": http_,
        "http_overhead_ms_p50": round(http_["p50_ms"] - direct["p50_ms"], 2),
        "traj_per_s_p50": round(args.n / (http_["p50_ms"] / 1e3), 1),
    }
    print("SERVE_BENCH " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
