"""Train CLI: chains stage-1 -> stage-2 -> stage-3 (reference
timevqvae/scripts/train.py:128-194; same surface: --config, --dataset_file,
--stage, --model_save_dir).

Checkpoints land in <model_save_dir>/<dataset-stem>/stage{N} with JSON meta
sidecars; metrics go to a JSONL run dir (and MLflow when configured).
"""

import argparse
import os
from pathlib import Path

from tvqvae_tpu.config import Config
from tvqvae_tpu.data import get_data
from tvqvae_tpu.train import runner
from tvqvae_tpu.utils.logging import RunLogger


def build_argparser():
    p = argparse.ArgumentParser(description="Train TimeVQVAE-TPU stages")
    p.add_argument("--config", type=str, default=None,
                   help="YAML config (reference schema); defaults built in")
    p.add_argument("--dataset_file", type=str, required=True,
                   help=".npz (X,y) or pickled traffic.Traffic")
    p.add_argument("--stage", type=str, default="all",
                   choices=["all", "1", "2", "3", "fcn"])
    p.add_argument("--model_save_dir", type=str, default="saved_models")
    p.add_argument("--run_dir", type=str, default="runs")
    p.add_argument("--max_steps", type=int, default=None,
                   help="override the per-stage step budget")
    p.add_argument("--search_tau", action="store_true",
                   help="run the FID-matching SVQ-temperature search before "
                        "stage 3 (reference defines but never calls it)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute in the stage-1 conv stacks and "
                        "the stage-3 U-Net stream (params/norm stats/VQ/"
                        "losses/attention stay fp32)")
    p.add_argument("--bundle_steps", type=int, default=10,
                   help="stage-1: optimizer steps per jitted lax.scan "
                        "bundle (>1 hides host round-trip latency; 1 = "
                        "classic per-step dispatch). Default 10 since "
                        "round 5 — the loop shape tools/full_run.py "
                        "trains with, chip-measured at/above the "
                        "sequential device rate (PERF.md probe E)")
    p.add_argument("--use_pallas", action="store_true",
                   help="use the fused Pallas VQ kernel in stage 1")
    p.add_argument("--remat", action="store_true",
                   help="stage-1: checkpoint conv blocks (recompute in "
                        "backward) — trades cheap FLOPs for activation HBM "
                        "traffic on the memory-bound step")
    p.add_argument("--fast_bn", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="BatchNorm/GroupNorm normalization in the compute "
                        "dtype (fp32-accumulated stats) — removes fp32 "
                        "activation materialization under --bf16. Default "
                        "ON since round 3 (chip-measured +2%% at B=32, "
                        "quality ladder unchanged — PERF.md 'fast_bn'); "
                        "--no-fast_bn restores flax-default promotion")
    p.add_argument("--bf16_mu", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="store the AdamW first moment in bfloat16 — the "
                        "optimizer state is the top HBM consumer of the "
                        "stage-1 step (chip-measured +2.4%% steps/s; "
                        "PERF.md round-4). Default ON since round 4: the "
                        "L=512 quality gate PASSED (gen FID inside the "
                        "measured run-to-run spread); --no-bf16_mu "
                        "restores fp32 state")
    p.add_argument("--bf16_nu", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="store the AdamW second moment in bfloat16 "
                        "(train.optim.adamw) — the symmetric lever to "
                        "--bf16_mu; update arithmetic stays fp32, only "
                        "storage precision changes. Quality-gated like "
                        "every lever (tools/quality_run.py --bf16_nu)")
    p.add_argument("--bf16_head", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="stage-1: TimeHead (L, L) dense matmul in the "
                        "compute dtype (params/residual fp32) — the "
                        "round-5 per-fusion roofline lever. Default ON "
                        "since round 5: +1.2%% bundled steps/s, +4.4%% "
                        "generation, seed-varied L=512 gate PASSED "
                        "(PERF.md round-5); --no-bf16_head opts out")
    p.add_argument("--bf16_istft", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="stage-1: bf16 overlap-add in the TRAINING step "
                        "(in the loss path — needs its own 3-seed gate; "
                        "chip-measured 18.56 vs 18.50 steps/s, PERF.md "
                        "round 5). The decode/sampler side is already "
                        "the bf16 default")
    p.add_argument("--rbg_rng", action="store_true",
                   help="stage-1: use XLA's cheap counter-based (rbg) "
                        "generator for the training rng (dropout masks) "
                        "instead of threefry — see tools/dropout_probe.py "
                        "for the measured cost difference")
    p.add_argument("--no_val_metrics", action="store_true",
                   help="skip validation-time sampling metrics "
                        "(running_metrics/FID etc.) in stages 2/3")
    p.add_argument("--no_precompute", action="store_true",
                   help="stages 2/3: recompute frozen-stage outputs inside "
                        "every step (reference behavior) instead of the "
                        "default one-sweep precompute")
    p.add_argument("--host_data", action="store_true",
                   help="feed batches from the host per step instead of "
                        "the default device-resident gather")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel width: train over a 2-D "
                        "(data, model) mesh with the big parameter leaves "
                        "and AdamW moments sharded over `model` "
                        "(parallel/tp.py) — for when per-chip HBM, not "
                        "batch math, is the constraint. Requires "
                        "n_devices %% tp == 0; single-process only")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    cfg = Config.from_yaml(args.config) if args.config else Config()
    data = get_data(args.dataset_file, cfg.dataset.features,
                    scale=cfg.dataset.data_scaling)
    stem = Path(args.dataset_file).stem
    ckpt_dir = os.path.join(args.model_save_dir, stem)
    os.makedirs(ckpt_dir, exist_ok=True)
    paths = {s: os.path.join(ckpt_dir, f"stage{s}") for s in ("1", "2", "3")}
    paths["fcn"] = os.path.join(ckpt_dir, "fcn")

    def logger(stage):
        return RunLogger(
            os.path.join(args.run_dir, f"{stem}_{stage}"),
            experiment_name=cfg.logger.experiment_name,
            run_name=f"{stem}_{stage}",
            mlflow_uri=cfg.logger.mlflow_uri,
        )

    val_metrics = None
    if not args.no_val_metrics and any(
        s in ("2", "3") for s in (["1", "2", "3"] if args.stage == "all"
                                  else [args.stage])
    ):
        from tvqvae_tpu.evaluation import Metrics

        # honor the configured featurizer (reference train.py passes
        # feature_extractor_type into Stage2/3); the supervised-FCN path
        # needs a trained fcn checkpoint and falls back to rocket otherwise
        fx = cfg.evaluation.feature_extractor_type
        fcn_vars = None
        if fx == "supervised_fcn":
            if os.path.exists(paths["fcn"]):
                from tvqvae_tpu.train.runner import load_fcn_bundle

                bundle, _ = load_fcn_bundle(paths["fcn"])
                fcn_vars = {"params": bundle["params"],
                            "batch_stats": bundle["batch_stats"]}
            else:
                print("[train] no fcn checkpoint; val metrics use rocket")
                fx = "rocket"
        val_metrics = Metrics(
            data.input_length, data.in_channels, data.n_classes,
            cfg.evaluation.batch_size, data.X_train, data.X_test,
            feature_extractor_type=fx, fcn_variables=fcn_vars,
        )

    stages = ["1", "2", "3"] if args.stage == "all" else [args.stage]
    for stage in stages:
        log = logger(f"stage{stage}" if stage != "fcn" else "fcn")
        try:
            if stage == "1":
                runner.train_stage1(
                    cfg, data, paths["1"], log, max_steps=args.max_steps,
                    use_pallas=args.use_pallas, seed=args.seed,
                    compute_dtype="bfloat16" if args.bf16 else "float32",
                    bundle_steps=args.bundle_steps,
                    data_on_device=not args.host_data,
                    remat=args.remat,
                    rng_impl="rbg" if args.rbg_rng else None,
                    fast_bn=args.fast_bn,
                    bf16_mu=args.bf16_mu,
                    bf16_nu=args.bf16_nu,
                    bf16_head=args.bf16_head,
                    bf16_istft=args.bf16_istft,
                    tp=args.tp,
                )
            elif stage == "2":
                runner.train_stage2(
                    cfg, data, paths["1"], paths["2"], log,
                    max_steps=args.max_steps, seed=args.seed,
                    metrics=val_metrics,
                    precompute=not args.no_precompute,
                    bundle_steps=args.bundle_steps,
                    bf16_mu=args.bf16_mu,
                    bf16_nu=args.bf16_nu,
                    tp=args.tp,
                )
            elif stage == "3":
                tau = 0.0
                if args.search_tau:
                    from tvqvae_tpu.evaluation import Metrics
                    from tvqvae_tpu.generation import (
                        TrainedModelSampler,
                        search_optimal_tau,
                    )

                    sampler = TrainedModelSampler(
                        cfg, paths["1"], paths["2"],
                        batch_size=cfg.evaluation.batch_size,
                    )
                    metrics = Metrics(
                        data.input_length, data.in_channels, data.n_classes,
                        cfg.evaluation.batch_size, data.X_train, data.X_test,
                        feature_extractor_type="rocket",
                    )
                    tau = search_optimal_tau(
                        cfg, sampler, metrics, data.X_train,
                        n_samples=cfg.evaluation.min_num_gen_samples,
                    )
                runner.train_stage3(
                    cfg, data, paths["1"], paths["3"], log,
                    max_steps=args.max_steps, tau=tau, seed=args.seed,
                    stage2_ckpt=paths["2"] if os.path.exists(paths["2"])
                    else None,
                    metrics=val_metrics,
                    precompute=not args.no_precompute,
                    bundle_steps=args.bundle_steps,
                    compute_dtype="bfloat16" if args.bf16 else "float32",
                    fast_norm=args.fast_bn,
                    bf16_mu=args.bf16_mu,
                    bf16_nu=args.bf16_nu,
                    tp=args.tp,
                )
            elif stage == "fcn":
                runner.train_fcn(cfg, data, paths["fcn"], log, seed=args.seed)
        finally:
            log.close()
    print(f"checkpoints in {ckpt_dir}")


if __name__ == "__main__":
    main()
