"""FULL-GEOMETRY measured run (VERDICT r2 item 1): structured synthetic data
at the published EHAM->LIMC shapes — X_train (5932, 4, 4633), X_test
(660, 4, 4633), 5 classes — trained through all three stages at the
PUBLISHED budgets (stage1 50k / stage2 200k / stage3 50k steps, batches
32/16/16, bf16) plus the FCN classifier, with MEASURED per-stage wall-clock,
then the full FID ladder + IS + stat metrics at full geometry.

Replaces the round-2 projections (PERF.md "projected 1.75 h") with
measurements. Real EHAM->LIMC data is absent in this environment
(BASELINE.md), so quality numbers are synthetic-data ladder numbers; the
wall-clock and shape/HBM behavior are the published-geometry reality.

Run on the real chip (background task, no timeout kill):

    PYTHONPATH=/root/repo python tools/full_run.py --workdir /tmp/fullrun \
        [--scale 0.01]  # smoke-test the script at 1% budgets first

Prints one JSON line per milestone and a final SUMMARY line.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

# persistent compile cache: the big stage-1/decode programs cost 100-250 s
# each over the remote-compile tunnel; caching makes stage relaunches and
# the eval phase warm (jax is pre-imported by the image, so use
# jax.config, not the env var).
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get(
                      "JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".cache", "jax")))

# published geometry (BASELINE.md; reference notebooks/pca_tsne.ipynb cell-2)
N_TOTAL = 6592  # -> seeded 90/10 split = 5932 / 660
CHANNELS = 4
LENGTH = 4633
N_CLASSES = 5

CFG_OVERRIDES = """\
dataset:
  batch_sizes: {stage1: 32, stage2: 16, stage3: 16}
trainer_params:
  max_steps: {stage1: %d, stage2: %d, stage3: %d}
  val_check_interval: {stage1: %d, stage2: %d, stage3: %d}
evaluation:
  batch_size: 64
  feature_extractor_type: rocket
"""


def log(obj):
    print(json.dumps(obj), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/fullrun")
    ap.add_argument("--scale", type=float, default=1.0,
                    help="budget scale (1.0 = published 50k/200k/50k)")
    ap.add_argument("--n_eval", type=int, default=1024,
                    help="generated samples for the ladder (reference "
                         "evaluates max(len(X_test), 1024))")
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--stages", default="1,2,3,fcn,eval",
                    help="comma list of stages to run (resume-friendly)")
    ap.add_argument("--bundle2", type=int, default=100,
                    help="stage-2 lax.scan bundle width (precomputed-token "
                         "steps are dispatch-bound; one program per N steps)")
    ap.add_argument("--bundle1", type=int, default=1,
                    help="stage-1 bundle width (device-resident data + "
                         "lax.scan; hides per-step dispatch latency)")
    ap.add_argument("--bundle3", type=int, default=1,
                    help="stage-3 bundle width (precomputed-x' path)")
    ap.add_argument("--bf16_mu", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="AdamW first moment in bfloat16 (all stages) — "
                         "round-4 production default (quality gate PASSED)")
    ap.add_argument("--bf16_nu", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="AdamW second moment in bfloat16 (all stages)")
    ap.add_argument("--fast_bn", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="fast BatchNorm/GroupNorm (compute-dtype "
                         "normalization, fp32-accumulated stats) for "
                         "stages 1/3 — the round-3 production default")
    args = ap.parse_args()

    wd = os.path.abspath(args.workdir)
    os.makedirs(wd, exist_ok=True)
    budgets = {
        "stage1": max(int(50_000 * args.scale), 10),
        "stage2": max(int(200_000 * args.scale), 10),
        "stage3": max(int(50_000 * args.scale), 10),
    }
    vals = {k: max(v // 4, 5) for k, v in budgets.items()}
    cfg_path = os.path.join(wd, "cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(CFG_OVERRIDES % (
            budgets["stage1"], budgets["stage2"], budgets["stage3"],
            vals["stage1"], vals["stage2"], vals["stage3"],
        ))
    data_path = os.path.join(wd, "full.npz")

    from tvqvae_tpu.config import Config
    from tvqvae_tpu.data import get_data, make_synthetic_trajectories, save_npz

    cfg = Config.from_yaml(cfg_path)
    if not os.path.exists(data_path):
        t0 = time.time()
        X, y = make_synthetic_trajectories(
            n=N_TOTAL, channels=CHANNELS, length=LENGTH,
            n_classes=N_CLASSES, seed=7,
        )
        save_npz(data_path, X, y)
        log({"milestone": "data", "shape": list(X.shape),
             "seconds": round(time.time() - t0, 1)})
    data = get_data(data_path, cfg.dataset.features,
                    scale=cfg.dataset.data_scaling)
    log({"milestone": "split", "train": len(data.X_train),
         "test": len(data.X_test), "L": data.input_length,
         "C": data.in_channels, "classes": data.n_classes})

    stages = args.stages.split(",")
    ckpt = os.path.join(wd, "models")
    os.makedirs(ckpt, exist_ok=True)
    paths = {s: os.path.join(ckpt, f"stage{s}") for s in ("1", "2", "3")}
    paths["fcn"] = os.path.join(ckpt, "fcn")
    res = {"scale": args.scale, "bf16": not args.fp32,
           "fast_bn": args.fast_bn, "bf16_mu": args.bf16_mu,
           "bf16_nu": args.bf16_nu}
    dtype = "float32" if args.fp32 else "bfloat16"

    from tvqvae_tpu.train import runner

    # per-stage measured wall-clock (the headline numbers)
    if "1" in stages:
        t0 = time.time()
        runner.train_stage1(cfg, data, paths["1"], None,
                            compute_dtype=dtype,
                            bundle_steps=args.bundle1,
                            fast_bn=args.fast_bn,
                            bf16_mu=args.bf16_mu,
                            bf16_nu=args.bf16_nu)
        dt = time.time() - t0
        res["stage1_minutes"] = round(dt / 60, 2)
        res["stage1_steps_per_s"] = round(budgets["stage1"] / dt, 2)
        log({"milestone": "stage1", **res})
    if "2" in stages:
        t0 = time.time()
        runner.train_stage2(cfg, data, paths["1"], paths["2"], None,
                            bundle_steps=args.bundle2,
                            bf16_mu=args.bf16_mu,
                            bf16_nu=args.bf16_nu)
        dt = time.time() - t0
        res["stage2_minutes"] = round(dt / 60, 2)
        res["stage2_steps_per_s"] = round(budgets["stage2"] / dt, 2)
        log({"milestone": "stage2", **res})
    if "3" in stages:
        t0 = time.time()
        runner.train_stage3(cfg, data, paths["1"], paths["3"], None,
                            bundle_steps=args.bundle3,
                            compute_dtype=dtype,
                            fast_norm=args.fast_bn,
                            bf16_mu=args.bf16_mu,
                            bf16_nu=args.bf16_nu)
        dt = time.time() - t0
        res["stage3_minutes"] = round(dt / 60, 2)
        res["stage3_steps_per_s"] = round(budgets["stage3"] / dt, 2)
        log({"milestone": "stage3", **res})
    if "fcn" in stages:
        t0 = time.time()
        runner.train_fcn(cfg, data, paths["fcn"], None)
        res["fcn_minutes"] = round((time.time() - t0) / 60, 2)
        log({"milestone": "fcn", **res})
    res["train_total_minutes"] = round(sum(
        v for k, v in res.items() if k.endswith("_minutes")
    ), 2)

    if "eval" in stages:
        from tvqvae_tpu.evaluation import Metrics
        from tvqvae_tpu.generation import TrainedModelSampler
        from tvqvae_tpu.train.runner import load_fcn_bundle

        t0 = time.time()
        n = args.n_eval
        metrics = Metrics(
            data.input_length, data.in_channels, data.n_classes,
            cfg.evaluation.batch_size, data.X_train, data.X_test,
            feature_extractor_type="rocket",
        )
        t_sqrtm = {"schur": 0.0, "svd": 0.0}

        def fid_both(key, z1, z2):
            # schur = reference-exact scipy sqrtm (headline, comparable to
            # the round-3 fullrun numbers); svd = exact trace identity
            # (eval_utils) — log both + their host cost at full geometry
            for m in ("schur", "svd"):
                tm = time.time()
                res[key if m == "schur" else key + "_svd"] = \
                    metrics.fid_score(z1, z2, method=m)
                t_sqrtm[m] += time.time() - tm
            return res[key]

        fid_both("fid_floor", metrics.z_train, metrics.z_test)
        noise = np.random.default_rng(0).normal(
            size=(min(n, 256), data.in_channels, data.input_length)
        ).astype(np.float32)
        fid_both("fid_noise", metrics.z_test, metrics.z_gen_fn(noise))
        log({"milestone": "fid_floor", "fid_floor": res["fid_floor"],
             "fid_noise": res["fid_noise"]})

        sampler = TrainedModelSampler(
            cfg, paths["1"], paths["2"], paths["3"],
            use_fidelity_enhancer=True, batch_size=64,
        )
        xrec = sampler.reconstruct(data.X_test[: min(n, len(data.X_test))])
        fid_both("fid_rec", metrics.z_test, metrics.z_gen_fn(xrec))
        sampler.use_fe = False
        t_gen = time.time()
        _, _, xgen = sampler.sample(n, seed=1)
        res["gen_seconds"] = round(time.time() - t_gen, 1)
        xgen_fe = sampler.enhance(xgen)
        fid_both("fid_gen", metrics.z_test, metrics.z_gen_fn(xgen))
        fid_both("fid_gen_fe", metrics.z_test, metrics.z_gen_fn(xgen_fe))
        res["fid_schur_seconds"] = round(t_sqrtm["schur"], 1)
        res["fid_svd_seconds"] = round(t_sqrtm["svd"], 1)
        mdd, acd, sd, kd = metrics.stat_metrics(metrics.X_test, xgen)
        res.update({"mdd": mdd, "acd": acd, "sd": sd, "kd": kd})

        # IS via the supervised FCN (reference eval_utils.py:9-53)
        if os.path.exists(paths["fcn"]):
            bundle, _ = load_fcn_bundle(paths["fcn"])
            m_fcn = Metrics(
                data.input_length, data.in_channels, data.n_classes,
                cfg.evaluation.batch_size, data.X_train[:8], data.X_test[:8],
                feature_extractor_type="supervised_fcn",
                fcn_variables={"params": bundle["params"],
                               "batch_stats": bundle["batch_stats"]},
            )
            is_mean, is_std = m_fcn.inception_score(xgen)
            res["is_mean"], res["is_std"] = is_mean, is_std
        res["eval_minutes"] = round((time.time() - t0) / 60, 2)

    print("SUMMARY " + json.dumps({
        k: (round(float(v), 5) if isinstance(v, (int, float))
            and not isinstance(v, bool) else v)
        for k, v in res.items()
    }), flush=True)


if __name__ == "__main__":
    main()
