"""Cross-framework quality showdown (VERDICT r4 next-1): train the
reference's OWN torch pipeline end-to-end and this framework on the SAME
synthetic dataset with IDENTICAL budgets, then evaluate both arms' products
with the SAME evaluator, producing one table:

    {reference-torch, tvqvae_tpu} x {FID_rec, FID_gen, FID_gen_FE, IS}

Until this exists, "matching FID" is parity-by-inference (component
transplants + differential metric tests); this makes it parity-by-
measurement.

Arms:
  reference  — the reference's own trainers (trainers/stage1.py:89-181,
               stage2.py:49-68, stage3.py:197-231) driven exactly like its
               scripts/train.py does (do_validate=False, max_steps cutoff,
               shuffled epochs), via tools/refshim.py. x-transformers is
               provided by the functional shim tools/xtshim.py, transplant-
               pinned against the reference module in tests/test_xtshim.py.
               Runs on CPU (torch; no TPU backend exists for it).
  tpu        — this framework's scripts/train.py at its production defaults
               (the same path tools/quality_run.py exercises).

Shared: the quality-ladder dataset (make_synthetic_trajectories n=1200,
C=4, L=512, 5 classes, seed 7), this repo's get_data scaling/split (parity-
tested against the reference's loader semantics, data/dataset.py:78-108),
and the quality_run budgets: stage1 3000 / stage2 5000 / stage3 1000 steps,
batch sizes 32/16/16, hid_dim 64.

Evaluator: this repo's Metrics (rocket features for the FID ladder; the
shared trained FCN for IS) applied to SAVED ARRAYS from both arms, plus a
cross-check of every FID with the reference's own eval_utils.calculate_fid
on the identical feature matrices.

Usage (each step resumable; artifacts under --workdir):
  python tools/showdown.py data        [--workdir /tmp/showdown]
  python tools/showdown.py ref         [--stage 1|2|3|all] [--measure]
  python tools/showdown.py ref-products
  python tools/showdown.py tpu
  python tools/showdown.py tpu-products
  python tools/showdown.py fcn         # shared IS classifier (our trainer)
  python tools/showdown.py eval        # the table (JSON + markdown)
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = os.path.join(REPO, "tools")
for p in (REPO, TOOLS):
    if p not in sys.path:
        sys.path.insert(0, p)

# identical to tools/quality_run.py CFG_OVERRIDES (the pinned showdown
# geometry + budgets)
BUDGETS = {"stage1": 3000, "stage2": 5000, "stage3": 1000}
BATCHES = {"stage1": 32, "stage2": 16, "stage3": 16}
HID_DIM = 64
N_EVAL = 1024  # the reference protocol size (stage2.py:92 n_samples=1024)
DATA_SEED, N, C, L, NCLS = 7, 1200, 4, 512, 5

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


def _paths(wd):
    return {
        "data": os.path.join(wd, "data.npz"),
        "cfg": os.path.join(wd, "cfg.yaml"),
        "ref_dir": os.path.join(wd, "ref"),
        "tpu_dir": os.path.join(wd, "tpu"),
        "fcn": os.path.join(wd, "fcn"),
        "result": os.path.join(wd, "showdown.json"),
    }


def _load_shared(wd):
    """Shared scaled train/test arrays — the ONE data source both arms see."""
    from tvqvae_tpu.config import Config
    from tvqvae_tpu.data import get_data

    p = _paths(wd)
    cfg = Config.from_yaml(p["cfg"])
    data = get_data(p["data"], cfg.dataset.features,
                    scale=cfg.dataset.data_scaling)
    return cfg, data


def cmd_data(args):
    from tvqvae_tpu.data import make_synthetic_trajectories, save_npz

    p = _paths(args.workdir)
    os.makedirs(args.workdir, exist_ok=True)
    X, y = make_synthetic_trajectories(
        n=N, channels=C, length=L, n_classes=NCLS, seed=DATA_SEED
    )
    save_npz(p["data"], X, y)
    with open(p["cfg"], "w") as f:
        f.write(CFG_OVERRIDES)
    _, data = _load_shared(args.workdir)
    print(json.dumps({
        "data": p["data"], "n_train": len(data.X_train),
        "n_test": len(data.X_test), "C": data.in_channels,
        "L": data.input_length, "n_classes": data.n_classes,
    }))


# --------------------------------------------------------------------------
# reference arm


def _ref_config(wd):
    """Reference config.yaml + the showdown overrides, as a plain dict."""
    import yaml

    import refshim

    with open(os.path.join(refshim.REFERENCE_ROOT,
                           "configs/config.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg["dataset"]["batch_sizes"] = dict(BATCHES)
    cfg["encoder"]["hid_dim"] = HID_DIM
    cfg["trainer_params"]["max_steps"] = dict(BUDGETS)
    cfg["evaluation"]["batch_size"] = 64
    cfg["evaluation"]["feature_extractor_type"] = "rocket"
    return cfg


def _patch_ref_metrics_ctor():
    """Skip the reference Metrics' construction-time rocket featurization of
    the full train/test sets. With do_validate=False (the reference's own
    scripts/train.py setting for every stage) the Metrics object is never
    USED during training — but its constructor still featurizes ~1200
    samples through the numba-stubbed pure-python rocket kernels (hours on
    this 1-core host). Training numerics are untouched."""
    from timevqvae.evaluation import metrics as ref_metrics

    ref_metrics.Metrics.compute_z = lambda self, X: np.zeros(
        (len(X), 2), dtype=np.float64
    )


def _ref_batches(X, Y, batch_size, seed, epochs_needed):
    """Shuffled-epoch iterator matching the reference's train DataLoader
    (data_utils.py:125-130: shuffle=True, drop_last=False)."""
    import torch

    g = np.random.default_rng(seed)
    n = len(X)
    for _ in range(epochs_needed):
        order = g.permutation(n)
        for i in range(0, n, batch_size):
            idx = order[i:i + batch_size]
            yield (torch.from_numpy(X[idx]).float(),
                   torch.from_numpy(Y[idx]).long())


def _train_ref_stage(model, batches, max_steps, tag, log_every=100):
    """The reference's optimization exactly as its Trainer drives it:
    training_step (which itself steps the LR scheduler,
    trainers/stage1.py:179-181) -> zero_grad -> backward -> AdamW step."""
    import torch

    opt_cfg = model.configure_optimizers()
    opt = opt_cfg["optimizer"]
    model._shim_scheduler = opt_cfg["lr_scheduler"]
    model.train()
    t0 = time.time()
    last = t0
    for step, batch in enumerate(batches):
        if step >= max_steps:
            break
        out = model.training_step(batch, step)
        opt.zero_grad(set_to_none=True)
        out["loss"].backward()
        opt.step()
        model.global_step = step + 1
        if (step + 1) % log_every == 0:
            now = time.time()
            print(json.dumps({
                "arm": "ref", "stage": tag, "step": step + 1,
                "loss": round(float(out["loss"].detach()), 5),
                "steps_per_sec": round(log_every / (now - last), 3),
            }), flush=True)
            last = now
    return time.time() - t0


def _ref_setup(wd, torch_seed=0):
    import refshim

    refshim.install()
    import torch

    torch.manual_seed(torch_seed)
    torch.set_num_threads(os.cpu_count() or 1)
    _patch_ref_metrics_ctor()
    cfg, data = _load_shared(wd)
    rcfg = _ref_config(wd)
    p = _paths(wd)
    rd = p["ref_dir"]
    os.makedirs(rd, exist_ok=True)
    ck = {s: os.path.join(rd, f"{s}.ckpt")
          for s in ("stage1", "stage2", "stage3")}
    return rcfg, data, rd, ck


def _save_ckpt(model, path):
    import torch

    torch.save({"state_dict": model.state_dict()}, path)


def cmd_ref(args):
    import torch

    rcfg, data, rd, ck = _ref_setup(args.workdir, torch_seed=args.torch_seed)
    X_train = np.ascontiguousarray(data.X_train, np.float32)
    Y_train = np.asarray(data.y_train).reshape(-1, 1).astype(np.int64)
    X_test = np.ascontiguousarray(data.X_test, np.float32)
    dev = torch.device("cpu")
    stages = ([args.stage] if args.stage != "all"
              else ["1", "2", "3"])
    timing = {}
    tpath = os.path.join(rd, "timing.json")
    if os.path.exists(tpath):
        timing = json.load(open(tpath))

    from timevqvae.trainers import Stage1, Stage2, Stage3

    def batches_for(stage_key):
        bs = BATCHES[stage_key]
        steps = 5 if args.measure else BUDGETS[stage_key]
        epochs = steps * bs // len(X_train) + 2
        return _ref_batches(X_train, Y_train, bs, seed=0,
                            epochs_needed=epochs), steps

    if "1" in stages and (args.measure or not os.path.exists(ck["stage1"])):
        m = Stage1(input_length=L, in_channels=C, config=rcfg)
        it, steps = batches_for("stage1")
        dt = _train_ref_stage(m, it, steps, "stage1",
                              log_every=5 if args.measure else 100)
        # measure mode saves too (throwaway workdir) so stage-2/3
        # construction can proceed for their own 5-step measurements
        _save_ckpt(m, ck["stage1"])
        if not args.measure:
            timing["stage1_minutes"] = round(dt / 60, 2)
        print(json.dumps({"arm": "ref", "stage": "stage1", "done": True,
                          "minutes": round(dt / 60, 2),
                          "steps": steps}), flush=True)
        del m

    if "2" in stages and (args.measure or not os.path.exists(ck["stage2"])):
        m = Stage2(
            stage1_ckpt_fname=ck["stage1"],
            fcn_ckpt_fname=os.path.join(rd, "fcn-unused.ckpt"),
            input_length=L, in_channels=C, n_classes=NCLS,
            X_train=X_train, X_test=X_test, config=rcfg, device=dev,
            feature_extractor_type="rocket",
        )
        it, steps = batches_for("stage2")
        dt = _train_ref_stage(m, it, steps, "stage2",
                              log_every=5 if args.measure else 100)
        _save_ckpt(m, ck["stage2"])
        if not args.measure:
            timing["stage2_minutes"] = round(dt / 60, 2)
        print(json.dumps({"arm": "ref", "stage": "stage2", "done": True,
                          "minutes": round(dt / 60, 2),
                          "steps": steps}), flush=True)
        del m

    if "3" in stages and (args.measure or not os.path.exists(ck["stage3"])):
        m = Stage3(
            stage1_ckpt_fname=ck["stage1"],
            stage2_ckpt_fname=ck["stage2"],
            fcn_ckpt_fname=os.path.join(rd, "fcn-unused.ckpt"),
            input_length=L, in_channels=C, n_classes=NCLS,
            X_train=X_train, X_test=X_test, config=rcfg, device=dev,
            feature_extractor_type="rocket",
        )
        # tau stays at its 0.0 buffer init: the reference's own train path
        # never calls search_optimal_tau (no caller in the repo), and
        # svq_temp=0.0 selects the deterministic path (vq.py:216)
        it, steps = batches_for("stage3")
        dt = _train_ref_stage(m, it, steps, "stage3",
                              log_every=5 if args.measure else 50)
        _save_ckpt(m, ck["stage3"])
        if not args.measure:
            timing["stage3_minutes"] = round(dt / 60, 2)
        print(json.dumps({"arm": "ref", "stage": "stage3", "done": True,
                          "minutes": round(dt / 60, 2),
                          "steps": steps}), flush=True)
        del m

    if not args.measure:
        json.dump(timing, open(tpath, "w"))
    print(json.dumps({"arm": "ref", "timing": timing}), flush=True)


def cmd_ref_products(args):
    """rec / gen / gen_fe arrays from the trained reference checkpoints,
    sampled the way the reference itself samples (maskgit.iterative_decoding
    + decode_token_ind_to_timeseries, trainers/stage3.py:96-103)."""
    import torch

    rcfg, data, rd, ck = _ref_setup(args.workdir)
    X_train = np.ascontiguousarray(data.X_train, np.float32)
    X_test = np.ascontiguousarray(data.X_test, np.float32)
    dev = torch.device("cpu")

    from timevqvae.trainers import Stage1, Stage3

    torch.manual_seed(123)
    s3 = Stage3(
        stage1_ckpt_fname=ck["stage1"], stage2_ckpt_fname=ck["stage2"],
        fcn_ckpt_fname=os.path.join(rd, "fcn-unused.ckpt"),
        input_length=L, in_channels=C, n_classes=NCLS,
        X_train=X_train, X_test=X_test, config=rcfg, device=dev,
        feature_extractor_type="rocket",
    )
    sd = torch.load(ck["stage3"], map_location="cpu",
                    weights_only=False)["state_dict"]
    s3.load_state_dict(sd)
    s3.eval()
    maskgit = s3.maskgit
    fe = s3.fidelity_enhancer

    n = N_EVAL
    bs = 32
    with torch.no_grad():
        # reconstruction through the trained stage-1 (forward return_x_rec)
        s1 = Stage1.load_from_checkpoint(
            ck["stage1"], input_length=L, in_channels=C, config=rcfg,
            map_location="cpu",
        )
        s1.eval()
        recs = []
        for i in range(0, n, bs):
            xb = torch.from_numpy(X_train[i:i + bs]).float()
            yb = torch.zeros(len(xb), 1, dtype=torch.long)
            recs.append(s1.forward((xb, yb), 0, return_x_rec=True))
        rec = torch.cat(recs).numpy()

        # unconditional generation (the reference's Metrics.sample path)
        gens = []
        t0 = time.time()
        for i in range(0, n, bs):
            num = min(bs, n - i)
            s_l, s_h = maskgit.iterative_decoding(
                num=num, device=dev, class_index=None
            )
            x_l = maskgit.decode_token_ind_to_timeseries(s_l, "lf")
            x_h = maskgit.decode_token_ind_to_timeseries(s_h, "hf")
            gens.append((x_l + x_h).cpu())
            print(json.dumps({"arm": "ref", "sampled": i + num,
                              "sec": round(time.time() - t0, 1)}),
                  flush=True)
        gen = torch.cat(gens).numpy()

        # FE-enhanced generation (trainers/stage3.py:272)
        fes = []
        for i in range(0, n, bs):
            xb = torch.from_numpy(gen[i:i + bs]).float()
            fes.append(fe(xb).cpu())
        gen_fe = torch.cat(fes).numpy()

    out = os.path.join(rd, "products.npz")
    np.savez_compressed(out, rec=rec, gen=gen, gen_fe=gen_fe)
    print(json.dumps({"arm": "ref", "products": out,
                      "shapes": {k: list(v.shape) for k, v in
                                 {"rec": rec, "gen": gen,
                                  "gen_fe": gen_fe}.items()}}), flush=True)


# --------------------------------------------------------------------------
# tpu arm


def cmd_tpu(args):
    p = _paths(args.workdir)
    td = p["tpu_dir"]
    os.makedirs(td, exist_ok=True)
    from tvqvae_tpu.scripts.train import main as train_main

    t0 = time.time()
    argv = [
        "--config", p["cfg"], "--dataset_file", p["data"],
        "--stage", "all",
        "--model_save_dir", os.path.join(td, "models"),
        "--run_dir", os.path.join(td, "runs"),
        "--seed", "0",
        # the shipped production recipe: bf16 conv stacks + the
        # quality-gated defaults (fast_bn/bf16_mu/bf16_head/bundling
        # ride train.py's defaults)
        "--bf16",
    ]
    train_main(argv)
    dt = time.time() - t0
    json.dump({"train_minutes": round(dt / 60, 2)},
              open(os.path.join(td, "timing.json"), "w"))
    print(json.dumps({"arm": "tpu", "train_minutes": round(dt / 60, 2)}),
          flush=True)


def cmd_tpu_products(args):
    from tvqvae_tpu.generation import TrainedModelSampler

    cfg, data = _load_shared(args.workdir)
    p = _paths(args.workdir)
    td = p["tpu_dir"]
    stem = os.path.splitext(os.path.basename(p["data"]))[0]
    ckpt = os.path.join(td, "models", stem)
    n = N_EVAL

    sampler = TrainedModelSampler(
        cfg, ckpt + "/stage1", ckpt + "/stage2", ckpt + "/stage3",
        use_fidelity_enhancer=True, batch_size=64,
    )
    rec = sampler.reconstruct(np.asarray(data.X_train[:n], np.float32))
    sampler.use_fe = False
    _, _, gen = sampler.sample(n, seed=1)
    gen_fe = sampler.enhance(gen)
    out = os.path.join(td, "products.npz")
    np.savez_compressed(out, rec=np.asarray(rec), gen=np.asarray(gen),
                        gen_fe=np.asarray(gen_fe))
    print(json.dumps({"arm": "tpu", "products": out}), flush=True)


def cmd_fcn(args):
    """Shared IS classifier: OUR FCN trained once on the shared dataset;
    the identical weights score both arms' samples."""
    from tvqvae_tpu.train import runner as tr

    cfg, data = _load_shared(args.workdir)
    p = _paths(args.workdir)
    tr.train_fcn(cfg, data, p["fcn"], None)
    print(json.dumps({"fcn": p["fcn"]}), flush=True)


# --------------------------------------------------------------------------
# evaluation


def cmd_eval(args):
    from tvqvae_tpu.evaluation import Metrics
    from tvqvae_tpu.train.runner import load_fcn_bundle

    cfg, data = _load_shared(args.workdir)
    p = _paths(args.workdir)
    n = N_EVAL

    metrics = Metrics(
        data.input_length, data.in_channels, data.n_classes,
        cfg.evaluation.batch_size, data.X_train, data.X_test,
        feature_extractor_type="rocket",
    )
    anchors = {
        "fid_floor": float(metrics.fid_score(metrics.z_train,
                                             metrics.z_test)),
        "fid_noise": float(metrics.fid_score(
            metrics.z_train,
            metrics.z_gen_fn(np.random.default_rng(0).normal(
                size=(n, data.in_channels, data.input_length)
            ).astype(np.float32)),
        )),
    }

    m_fcn = None
    if os.path.exists(p["fcn"]):
        bundle, _ = load_fcn_bundle(p["fcn"])
        m_fcn = Metrics(
            data.input_length, data.in_channels, data.n_classes,
            cfg.evaluation.batch_size, data.X_train, data.X_test,
            feature_extractor_type="supervised_fcn",
            fcn_variables={"params": bundle["params"],
                           "batch_stats": bundle["batch_stats"]},
        )

    arms = {}
    zs = {}
    for arm, d in (("ref", p["ref_dir"]), ("tpu", p["tpu_dir"])):
        prod = os.path.join(d, "products.npz")
        if not os.path.exists(prod):
            print(json.dumps({"warn": f"{arm} products missing: {prod}"}),
                  flush=True)
            continue
        with np.load(prod) as z:
            rec, gen, gen_fe = z["rec"], z["gen"], z["gen_fe"]
        row = {}
        zrow = {}
        for key, arr in (("rec", rec), ("gen", gen), ("gen_fe", gen_fe)):
            zarr = metrics.z_gen_fn(np.asarray(arr, np.float32))
            zrow[key] = zarr
            row[f"fid_{key}"] = float(
                metrics.fid_score(metrics.z_train, zarr)
            )
        if m_fcn is not None:
            is_mean, is_std = m_fcn.inception_score(
                np.asarray(gen, np.float32)
            )
            row["is_mean"] = float(is_mean)
            row["is_std"] = float(is_std)
        tpath = os.path.join(d, "timing.json")
        if os.path.exists(tpath):
            row["timing_minutes"] = json.load(open(tpath))
        arms[arm] = row
        zs[arm] = zrow

    # cross-check every FID with the reference's own eval_utils on the
    # SAME feature matrices
    import refshim

    installed = refshim.install()
    try:
        from timevqvae.evaluation.eval_utils import (
            calculate_fid as ref_calculate_fid,
        )

        for arm, zrow in zs.items():
            for key, zarr in zrow.items():
                arms[arm][f"fid_{key}_refcode"] = float(
                    ref_calculate_fid(metrics.z_train, zarr)
                )
        anchors["fid_floor_refcode"] = float(
            ref_calculate_fid(metrics.z_train, metrics.z_test)
        )
    finally:
        refshim.uninstall(installed)

    result = {"anchors": anchors, "arms": arms,
              "geometry": {"n_train": len(data.X_train), "C": C, "L": L,
                           "n_classes": NCLS, "budgets": BUDGETS,
                           "batch_sizes": BATCHES, "hid_dim": HID_DIM,
                           "n_eval": n}}
    json.dump(result, open(p["result"], "w"), indent=1)
    print(json.dumps(result), flush=True)

    # markdown table
    def fmt(v):
        return f"{v:.5f}" if isinstance(v, float) else str(v)

    cols = ["fid_rec", "fid_gen", "fid_gen_fe", "is_mean"]
    lines = ["| arm | " + " | ".join(cols) + " | train_minutes |",
             "|---|" + "---|" * (len(cols) + 1)]
    for arm, row in arms.items():
        tm = row.get("timing_minutes", {})
        total = sum(v for k, v in tm.items() if k.endswith("minutes")) \
            if isinstance(tm, dict) else ""
        lines.append(
            f"| {arm} | "
            + " | ".join(fmt(row.get(c, "")) for c in cols)
            + f" | {fmt(round(total, 1)) if total else ''} |"
        )
    print("\n".join(lines))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["data", "ref", "ref-products", "tpu",
                                    "tpu-products", "fcn", "eval"])
    ap.add_argument("--workdir", default="/tmp/showdown")
    ap.add_argument("--stage", default="all", choices=["1", "2", "3", "all"])
    ap.add_argument("--measure", action="store_true",
                    help="time 5 steps per stage instead of training")
    ap.add_argument("--torch_seed", type=int, default=0,
                    help="reference-arm torch init/training seed (use a "
                         "separate --workdir per seed)")
    args = ap.parse_args()
    {
        "data": cmd_data, "ref": cmd_ref, "ref-products": cmd_ref_products,
        "tpu": cmd_tpu, "tpu-products": cmd_tpu_products, "fcn": cmd_fcn,
        "eval": cmd_eval,
    }[args.cmd](args)


if __name__ == "__main__":
    main()
