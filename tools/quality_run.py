"""End-to-end quality run: synthetic data -> 3-stage training -> FID ladder.

The repeatable learning check from .claude/skills/verify/SKILL.md (real
EHAM->LIMC data is not available in this environment, BASELINE.md): train the
full pipeline on structured synthetic trajectories at reduced scale and
verify the FID ladder ordering

    floor (z_train vs z_test)  <~  rec  <~  gen  <<  noise

plus FID with the fidelity enhancer and (optionally) the ESS sampler timing
on the trained checkpoints. Run on the real TPU chip:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/quality_run.py \
        --workdir /tmp/qr [--bf16] [--ess]

Prints one JSON line per quantity and a final summary JSON.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

CFG_OVERRIDES = """\
dataset:
  batch_sizes: {stage1: 32, stage2: 16, stage3: 16}
encoder:
  hid_dim: 64
trainer_params:
  max_steps: {stage1: 3000, stage2: 5000, stage3: 1000}
  val_check_interval: {stage1: 1500, stage2: 2500, stage3: 500}
evaluation:
  batch_size: 64
  feature_extractor_type: rocket
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/qr")
    ap.add_argument("--fast_bn", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="stage-1 BN normalization in the compute dtype "
                         "(the --fast_bn training lever; matches the "
                         "train.py default, which flipped ON in round 3 — "
                         "use --no-fast_bn to quality-gate the OFF arm)")
    ap.add_argument("--bf16", action="store_true",
                    help="train the stage-1 conv stacks in bfloat16")
    ap.add_argument("--bf16_mu", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="AdamW first moment in bfloat16 (all stages) — "
                         "quality-gate arm for the bench.py --bf16_mu lever; "
                         "default ON to match the round-4 production default "
                         "(use --no-bf16_mu to gate the fp32-state arm)")
    ap.add_argument("--bf16_nu", action="store_true",
                    help="AdamW second moment in bfloat16 (all stages) — "
                         "quality-gate arm for the bench.py --bf16_nu lever")
    ap.add_argument("--bf16_head", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="stage-1 TimeHead (L, L) matmul in the compute "
                         "dtype — the round-5 bf16_head lever; default ON "
                         "to match the production default (gates PASSED "
                         "seeds 0/101/202); --no-bf16_head gates the "
                         "fp32-head arm")
    ap.add_argument("--bf16_istft", action="store_true",
                    help="stage-1 TRAINING-side bf16 overlap-add — the "
                         "round-6 gate arm (decode side is already "
                         "default)")
    ap.add_argument("--ess", action="store_true",
                    help="also time the ESS sampler on the trained ckpts")
    ap.add_argument("--seed", type=int, default=0,
                    help="training seed (init + training RNG, passed to "
                         "train.py --seed) and sampling-seed offset; the "
                         "synthetic DATASET seed stays fixed so seed-varied "
                         "runs measure training noise on the same task — "
                         "the lever for measuring the run-to-run FID "
                         "spread that quality-gates optimizer-precision "
                         "default flips")
    ap.add_argument("--n_eval", type=int, default=256)
    ap.add_argument("--skip_train", action="store_true",
                    help="reuse checkpoints already in workdir")
    args = ap.parse_args()

    wd = os.path.abspath(args.workdir)
    os.makedirs(wd, exist_ok=True)
    cfg_path = os.path.join(wd, "cfg.yaml")
    data_path = os.path.join(wd, "qr.npz")

    from tvqvae_tpu.config import Config
    from tvqvae_tpu.data import get_data, make_synthetic_trajectories, save_npz

    # --- data + config -----------------------------------------------------
    X, y = make_synthetic_trajectories(
        n=1200, channels=4, length=512, n_classes=5, seed=7
    )
    save_npz(data_path, X, y)
    with open(cfg_path, "w") as f:
        f.write(CFG_OVERRIDES)
    cfg = Config.from_yaml(cfg_path)

    # --- train -------------------------------------------------------------
    t0 = time.time()
    if not args.skip_train:
        from tvqvae_tpu.scripts.train import main as train_main

        argv = [
            "--config", cfg_path, "--dataset_file", data_path,
            "--stage", "all",
            "--model_save_dir", os.path.join(wd, "models"),
            "--run_dir", os.path.join(wd, "runs"),
        ]
        if args.bf16:
            argv.append("--bf16")
        # always pass the resolved state: train.py defaults fast_bn ON, so
        # omitting the flag would silently train the ON arm while the
        # summary recorded False (ADVICE r3 #1)
        argv.append("--fast_bn" if args.fast_bn else "--no-fast_bn")
        argv.append("--bf16_mu" if args.bf16_mu else "--no-bf16_mu")
        if args.bf16_nu:
            argv.append("--bf16_nu")
        argv.append("--bf16_head" if args.bf16_head else "--no-bf16_head")
        if args.bf16_istft:
            argv.append("--bf16_istft")
        argv += ["--seed", str(args.seed)]
        train_main(argv)
    train_minutes = (time.time() - t0) / 60.0
    print(json.dumps({"train_minutes": round(train_minutes, 1),
                      "bf16": args.bf16, "bf16_mu": args.bf16_mu,
                      "bf16_nu": args.bf16_nu,
                      "bf16_head": args.bf16_head, "seed": args.seed,
                      "fast_bn": args.fast_bn}), flush=True)

    # --- FID ladder ----------------------------------------------------------
    from tvqvae_tpu.evaluation import Metrics
    from tvqvae_tpu.generation import TrainedModelSampler

    data = get_data(data_path, cfg.dataset.features,
                    scale=cfg.dataset.data_scaling)
    ckpt = os.path.join(wd, "models", "qr")
    n = args.n_eval

    metrics = Metrics(
        data.input_length, data.in_channels, data.n_classes,
        cfg.evaluation.batch_size, data.X_train, data.X_test,
        feature_extractor_type="rocket",
    )
    res = {}
    res["fid_floor"] = metrics.fid_score(metrics.z_train, metrics.z_test)
    noise = np.random.default_rng(0).normal(
        size=(n, data.in_channels, data.input_length)
    ).astype(np.float32)
    res["fid_noise"] = metrics.fid_score(
        metrics.z_train, metrics.z_gen_fn(noise)
    )
    print(json.dumps({k: round(v, 5) for k, v in res.items()}), flush=True)

    sampler = TrainedModelSampler(
        cfg, ckpt + "/stage1", ckpt + "/stage2", ckpt + "/stage3",
        use_fidelity_enhancer=True, batch_size=64,
    )
    xrec = sampler.reconstruct(data.X_train[:n])
    res["fid_rec"] = metrics.fid_score(
        metrics.z_train, metrics.z_gen_fn(xrec)
    )
    sampler.use_fe = False  # raw samples first; enhance() them separately
    _, _, xgen = sampler.sample(n, seed=1 + args.seed)
    xgen_fe = sampler.enhance(xgen)
    res["fid_gen"] = metrics.fid_score(
        metrics.z_train, metrics.z_gen_fn(xgen)
    )
    res["fid_gen_fe"] = metrics.fid_score(
        metrics.z_train, metrics.z_gen_fn(xgen_fe)
    )
    print(json.dumps({k: round(float(v), 5) for k, v in res.items()}),
          flush=True)

    # --- ESS timing (optional) ---------------------------------------------
    if args.ess:
        import dataclasses

        import jax

        ess_cfg = dataclasses.replace(
            cfg, maskgit=dataclasses.replace(cfg.maskgit, ess_use=True)
        )
        ess_sampler = TrainedModelSampler(
            ess_cfg, ckpt + "/stage1", ckpt + "/stage2", batch_size=32,
        )
        # Drain with a device->host VALUE fetch: on this backend
        # block_until_ready can signal before execution (PERF.md
        # MEASUREMENT CORRECTION); device programs execute in order, so
        # fetching a value from the last output drains the whole chain.
        import jax.numpy as jnp

        def _drain(o):
            return float(jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32)))

        out = ess_sampler._sample_batch(jax.random.key(0), 32, None)
        _drain(out)
        t0 = time.perf_counter()
        iters = 10
        for i in range(iters):
            out = ess_sampler._sample_batch(jax.random.key(i + 1), 32, None)
        _drain(out)
        res["ess_ms_per_32batch"] = (time.perf_counter() - t0) / iters * 1e3
        _, _, x_ess = ess_sampler.sample(n, seed=2)
        res["fid_gen_ess"] = metrics.fid_score(
            metrics.z_train, metrics.z_gen_fn(x_ess)
        )

    res["train_minutes"] = train_minutes
    res["bf16"] = args.bf16
    res["fast_bn"] = args.fast_bn
    res["bf16_mu"] = args.bf16_mu
    res["bf16_nu"] = args.bf16_nu
    res["bf16_head"] = args.bf16_head
    res["bf16_istft"] = args.bf16_istft
    res["seed"] = args.seed
    print("SUMMARY " + json.dumps(
        {k: (round(float(v), 5) if isinstance(v, (int, float)) and
             not isinstance(v, bool) else v) for k, v in res.items()}
    ), flush=True)


if __name__ == "__main__":
    main()
