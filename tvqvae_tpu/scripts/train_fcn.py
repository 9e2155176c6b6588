"""FCN classifier training CLI (reference timevqvae/scripts/train_fcn.py).

The FCN is the FID/IS feature network. Note: the reference passes
`max_epochs` (1000) as Lightning's `max_steps` (train_fcn.py:237), so it
effectively trains 1000 optimizer steps — we keep that budget by default
(`--max_steps 1000`) rather than cargo-culting the name.
"""

import argparse
import os
from pathlib import Path

from tvqvae_tpu.config import Config, load_yaml
from tvqvae_tpu.data import get_data
from tvqvae_tpu.train import runner
from tvqvae_tpu.utils.logging import RunLogger


def main(argv=None):
    p = argparse.ArgumentParser(description="Train the supervised FCN")
    p.add_argument("--config", type=str, default=None,
                   help="fcn_config.yaml (reference schema)")
    p.add_argument("--dataset_file", type=str, required=True)
    p.add_argument("--model_save_dir", type=str, default="saved_models")
    p.add_argument("--run_dir", type=str, default="runs")
    p.add_argument("--max_steps", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=1e-5)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    cfg = Config()
    features = cfg.dataset.features
    lr, wd, bs = args.lr, args.weight_decay, args.batch_size
    if args.config:
        raw = load_yaml(args.config)
        features = raw.get("dataset", {}).get("features", features)
        exp = raw.get("exp_params", {})
        lr = float(exp.get("LR", lr))
        wd = float(exp.get("weight_decay", wd))
        bs = int(raw.get("dataset", {}).get("batch_size", bs))

    data = get_data(args.dataset_file, features)
    stem = Path(args.dataset_file).stem
    save_path = os.path.join(args.model_save_dir, stem, "fcn")
    log = RunLogger(os.path.join(args.run_dir, f"{stem}_fcn"),
                    run_name=f"{stem}_fcn", mlflow_uri=cfg.logger.mlflow_uri)
    try:
        runner.train_fcn(
            cfg, data, save_path, log, max_epochs=args.max_steps,
            batch_size=bs, lr=lr, weight_decay=wd, seed=args.seed,
        )
    finally:
        log.close()
    print(f"fcn checkpoint at {save_path}")


if __name__ == "__main__":
    main()
