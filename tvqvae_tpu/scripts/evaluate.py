"""Evaluate CLI: FID / IS / statistical metrics + visual artifacts.

Reference: timevqvae/scripts/evaluate.py:14-302 — unconditional sampling of
max(|X_test|, min_num_gen_samples), FID between test and generated feature
sets (plus stage-1 reconstruction and SVQ round-trip diagnostics), IS
through the supervised FCN, TSGBench stat metrics, the fidelity-enhancer
branch, per-class conditional sample grids, and PCA/t-SNE/visual-inspection
artifacts. Metric names match the reference exactly (SURVEY.md §5.5).
"""

import argparse
import json
import os
from pathlib import Path

from tvqvae_tpu.config import Config
from tvqvae_tpu.data import get_data
from tvqvae_tpu.evaluation import Metrics
from tvqvae_tpu.generation import TrainedModelSampler
from tvqvae_tpu.train.runner import load_fcn_bundle
from tvqvae_tpu.utils.logging import RunLogger
from tvqvae_tpu.utils import plots


def evaluate(cfg: Config, data, ckpt_dir: str, logger: RunLogger,
             batch_size: int, min_num_gen: int, use_fe: bool,
             feature_extractor_type: str, seed: int = 0,
             fid_method: str = "schur") -> dict:
    stage1 = os.path.join(ckpt_dir, "stage1")
    stage2 = os.path.join(ckpt_dir, "stage2")
    stage3 = os.path.join(ckpt_dir, "stage3")
    fcn_path = os.path.join(ckpt_dir, "fcn")
    have_fe = os.path.exists(stage3) and use_fe
    have_fcn = os.path.exists(fcn_path)

    sampler = TrainedModelSampler(
        cfg, stage1, stage2,
        stage3_ckpt=stage3 if os.path.exists(stage3) else None,
        batch_size=batch_size,
    )
    fcn_vars = None
    if have_fcn:
        bundle, _ = load_fcn_bundle(fcn_path)
        fcn_vars = {"params": bundle["params"],
                    "batch_stats": bundle["batch_stats"]}
    metrics = Metrics(
        data.input_length, data.in_channels, data.n_classes, batch_size,
        data.X_train, data.X_test,
        feature_extractor_type=feature_extractor_type,
        fcn_variables=fcn_vars if feature_extractor_type == "supervised_fcn"
        else None,
        fid_method=fid_method,
    )
    fcn_metrics = None
    if have_fcn:
        fcn_metrics = metrics if feature_extractor_type == "supervised_fcn" \
            else Metrics(
                data.input_length, data.in_channels, data.n_classes,
                batch_size, data.X_train[:batch_size], data.X_test[:batch_size],
                feature_extractor_type="supervised_fcn",
                fcn_variables=fcn_vars,
            )

    results = {}
    n_gen = max(len(data.X_test), min_num_gen)
    print(f"[evaluate] sampling {n_gen} unconditional trajectories...")
    x_l, x_h, x_gen = sampler.sample(n_gen, "unconditional", seed=seed)

    # feature sets (reference evaluate.py:79-141)
    z_gen = metrics.z_gen_fn(x_gen)
    x_rec = sampler.reconstruct(data.X_test)
    z_rec = metrics.compute_z(x_rec)

    results["FID"] = metrics.fid_score(metrics.z_test, z_gen)
    results["FID_rec"] = metrics.fid_score(metrics.z_test, z_rec)
    mdd, acd, sd, kd = metrics.stat_metrics(data.X_test, x_gen)
    results.update({"MDD": mdd, "ACD": acd, "SD": sd, "KD": kd})
    if fcn_metrics is not None:
        is_mean, is_std = fcn_metrics.inception_score(x_gen)
        results["IS_mean"], results["IS_std"] = is_mean, is_std

    logger.log_image(
        plots.plot_visual_inspection(data.X_test, x_gen),
        "visual_inspection.png",
    )
    logger.log_image(
        plots.plot_pca([metrics.z_test, z_gen], ["Z_test", "Z_gen"]),
        "pca_test_gen.png",
    )
    logger.log_image(
        plots.plot_tsne([metrics.z_test, z_gen], ["Z_test", "Z_gen"]),
        "tsne_test_gen.png",
    )

    # fidelity-enhancer branch (reference evaluate.py:144-205)
    if have_fe:
        x_gen_fe = sampler.enhance(x_gen)
        z_gen_fe = metrics.z_gen_fn(x_gen_fe)
        results["FID with FE"] = metrics.fid_score(metrics.z_test, z_gen_fe)
        mdd, acd, sd, kd = metrics.stat_metrics(data.X_test, x_gen_fe)
        results.update({
            "MDD with FE": mdd, "ACD with FE": acd,
            "SD with FE": sd, "KD with FE": kd,
        })
        if fcn_metrics is not None:
            is_mean, is_std = fcn_metrics.inception_score(x_gen_fe)
            results["IS_mean with FE"] = is_mean
            results["IS_std with FE"] = is_std
        # SVQ round-trip diagnostic at the stored tau (reference :144-205)
        if sampler.tau and sampler.tau > 0:
            x_svq = sampler.reconstruct(
                data.X_test, svq_temp=sampler.tau, seed=seed
            )
            z_svq = metrics.compute_z(x_svq)
            results["FID_svq"] = metrics.fid_score(metrics.z_test, z_svq)
        logger.log_image(
            plots.plot_visual_inspection(
                data.X_test, x_gen_fe, title="visual inspection (FE)"
            ),
            "visual_inspection_fe.png",
        )
        logger.log_image(
            plots.plot_pca([metrics.z_test, z_gen_fe], ["Z_test", "Z_gen_FE"]),
            "pca_test_gen_fe.png",
        )

    # per-class conditional grids (reference evaluate.py:207-270)
    for cls in range(data.n_classes):
        _, _, xc = sampler.sample(
            min(batch_size, 16), "conditional", class_index=cls,
            seed=seed + cls,
        )
        logger.log_image(
            plots.plot_visual_inspection(
                data.X_test[(data.y_test[:, 0] == cls)][:16], xc,
                title=f"class {cls}",
            ),
            f"conditional_class_{cls}.png",
        )

    logger.log_metrics(results, step=0)
    return results


def main(argv=None):
    p = argparse.ArgumentParser(description="Evaluate trained models")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--dataset_file", type=str, required=True)
    p.add_argument("--model_save_dir", type=str, default="saved_models")
    p.add_argument("--run_dir", type=str, default="runs")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--min_num_gen_samples", type=int, default=None)
    p.add_argument("--no_fidelity_enhancer", action="store_true")
    p.add_argument("--feature_extractor_type", type=str, default=None,
                   choices=[None, "rocket", "supervised_fcn"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fid_method", type=str, default="schur",
                   choices=("schur", "svd"),
                   help="schur = reference-exact scipy sqrtm; svd = exact "
                        "trace identity, ~50x faster at eval shapes")
    args = p.parse_args(argv)

    cfg = Config.from_yaml(args.config) if args.config else Config()
    data = get_data(args.dataset_file, cfg.dataset.features,
                    scale=cfg.dataset.data_scaling)
    stem = Path(args.dataset_file).stem
    ckpt_dir = os.path.join(args.model_save_dir, stem)
    logger = RunLogger(
        os.path.join(args.run_dir, f"{stem}_evaluate"),
        experiment_name=cfg.logger.experiment_name,
        run_name=f"{stem}_evaluate",
        mlflow_uri=cfg.logger.mlflow_uri,
    )
    try:
        results = evaluate(
            cfg, data, ckpt_dir, logger,
            batch_size=args.batch_size or cfg.evaluation.batch_size,
            min_num_gen=args.min_num_gen_samples
            or cfg.evaluation.min_num_gen_samples,
            use_fe=not args.no_fidelity_enhancer,
            feature_extractor_type=args.feature_extractor_type
            or cfg.evaluation.feature_extractor_type,
            seed=args.seed,
            fid_method=args.fid_method,
        )
    finally:
        logger.close()
    print(json.dumps({k: float(v) for k, v in results.items()}, indent=2))


if __name__ == "__main__":
    main()
