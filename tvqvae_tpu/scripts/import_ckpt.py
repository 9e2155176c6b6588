"""Import reference-trained checkpoints (torch) into framework checkpoints.

    import_ckpt --stage1_ckpt saved_models/DS/stage1.ckpt \
                --stage2_ckpt saved_models/DS/stage2.ckpt \
                --stage3_ckpt saved_models/DS/stage3.ckpt \
                --fcn_ckpt saved_models/DS/fcn.ckpt \
                --out_dir saved_models/OpenSky_EHAM_LIMC --n_classes 5

Writes Orbax checkpoints this framework's loaders read directly
(`runner.load_stage1_bundle`, `runner.load_fcn_bundle`, and the
TrainedModelSampler's stage-2/3 paths): an imported stage-1 enables
reconstruction / SVQ round-trips / recon-FID evaluation, an imported
stage-2 carries over the trained prior transformers (the full sampler
then runs on reference weights end-to-end), an imported FCN makes FID/IS
numbers computed here feature-identical to the reference's (the
transplant tests pin the conversion to 2e-4), and an imported stage-3
carries over the trained fidelity enhancer (incl. its tau buffer). See
tvqvae_tpu/utils/import_reference.py for the conversions.

Every imported tree is validated against a freshly-initialized model of the
same config: identical tree structure and shapes, or the CLI aborts with
the geometry it inferred from the weights.
"""

import argparse
import dataclasses
import os

import numpy as np


def _load_torch(path: str):
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def _tree_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_tree_shapes(v, p))
        else:
            out[p] = tuple(np.shape(v))
    return out


def _assert_same_tree(imported, fresh, what: str, inferred: dict):
    a, b = _tree_shapes(imported), _tree_shapes(fresh)
    missing = sorted(set(b) - set(a))
    extra = sorted(set(a) - set(b))
    mismatch = sorted(
        k for k in set(a) & set(b) if a[k] != b[k]
    )
    if missing or extra or mismatch:
        lines = [f"{what}: imported tree does not match the config's model."]
        if inferred:
            lines.append(f"geometry inferred from the weights: {inferred}")
        for tag, ks in (("missing", missing), ("unexpected", extra)):
            if ks:
                lines.append(f"{tag} ({len(ks)}): {ks[:6]}{'...' if len(ks) > 6 else ''}")
        for k in mismatch[:6]:
            lines.append(f"shape mismatch {k}: imported {a[k]} vs model {b[k]}")
        raise SystemExit("\n".join(lines))


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Import reference torch checkpoints"
    )
    p.add_argument("--stage1_ckpt", type=str, default=None,
                   help="reference stage1.ckpt (Lightning)")
    p.add_argument("--stage2_ckpt", type=str, default=None,
                   help="reference stage2.ckpt (Lightning; both prior "
                        "transformers are imported — the frozen stage-1 "
                        "copy inside it is ignored)")
    p.add_argument("--stage3_ckpt", type=str, default=None,
                   help="reference stage3.ckpt (Lightning; the fidelity-"
                        "enhancer weights + tau are imported)")
    p.add_argument("--fcn_ckpt", type=str, default=None,
                   help="reference fcn.ckpt (raw state_dict)")
    p.add_argument("--out_dir", type=str, required=True,
                   help="framework model dir (e.g. saved_models/<dataset>)")
    p.add_argument("--config", type=str, default=None,
                   help="YAML config matching the reference training run "
                        "(defaults to the published config)")
    p.add_argument("--n_classes", type=int, default=None,
                   help="class count for the stage-1 meta (taken from the "
                        "FCN head when --fcn_ckpt is given)")
    args = p.parse_args(argv)
    if not any((args.stage1_ckpt, args.stage2_ckpt, args.stage3_ckpt,
                args.fcn_ckpt)):
        p.error("nothing to do: pass --stage1_ckpt, --stage2_ckpt, "
                "--stage3_ckpt and/or --fcn_ckpt")
    if args.stage2_ckpt and not args.stage1_ckpt:
        p.error("--stage2_ckpt needs --stage1_ckpt in the same invocation "
                "(the prior's token-grid geometry comes from the stage-1 "
                "spec)")
    if args.stage3_ckpt and not args.stage1_ckpt:
        p.error("--stage3_ckpt needs --stage1_ckpt in the same invocation "
                "(the sampler reads the FE geometry from the stage-1 meta)")

    from tvqvae_tpu.config import Config
    from tvqvae_tpu.utils.checkpoint import save_checkpoint
    from tvqvae_tpu.utils.import_reference import (
        fcn_from_state_dict,
        fe_from_state_dict,
        stage1_from_state_dict,
        stage2_from_state_dict,
    )

    cfg = Config.from_yaml(args.config) if args.config else Config()
    os.makedirs(args.out_dir, exist_ok=True)
    n_classes = args.n_classes

    if args.fcn_ckpt:
        variables, inferred = fcn_from_state_dict(_load_torch(args.fcn_ckpt))
        print(f"[import] fcn.ckpt: {inferred}")
        from tvqvae_tpu.models.fcn import FCN

        import jax

        fcn = FCN(n_classes=inferred["n_classes"])
        x0 = np.zeros((1, inferred["in_channels"], 64), np.float32)
        fresh = fcn.init(jax.random.key(0), x0, False)
        _assert_same_tree(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            {"params": fresh["params"], "batch_stats": fresh["batch_stats"]},
            "fcn", inferred,
        )
        out = os.path.join(args.out_dir, "fcn")
        save_checkpoint(out, variables, meta={
            "config": dataclasses.asdict(cfg),
            "in_channels": inferred["in_channels"],
            "n_classes": inferred["n_classes"],
            "imported_from": os.path.abspath(args.fcn_ckpt),
        })
        print(f"[import] wrote {out}")
        n_classes = n_classes or inferred["n_classes"]

    if args.stage1_ckpt:
        if n_classes is None:
            p.error("--n_classes is required with --stage1_ckpt "
                    "(or pass --fcn_ckpt to take it from the FCN head)")
        params, stats, vq_l, vq_h, inferred = stage1_from_state_dict(
            _load_torch(args.stage1_ckpt)
        )
        print(f"[import] stage1.ckpt: {inferred}")

        import jax

        from tvqvae_tpu.models.stage1 import Stage1Spec, init_stage1

        spec = Stage1Spec.from_config(
            cfg, inferred["input_length"], inferred["in_channels"]
        )
        x0 = np.zeros(
            (1, inferred["in_channels"], inferred["input_length"]), np.float32
        )
        _, f_params, f_stats, f_vql, f_vqh = init_stage1(
            jax.random.key(0), spec, x0
        )
        _assert_same_tree(
            {"params": params, "batch_stats": stats,
             "vq_l": {"embed": vq_l["embed"]},
             "vq_h": {"embed": vq_h["embed"]}},
            {"params": f_params, "batch_stats": f_stats,
             "vq_l": {"embed": np.asarray(f_vql.embed)},
             "vq_h": {"embed": np.asarray(f_vqh.embed)}},
            "stage1", inferred,
        )
        out = os.path.join(args.out_dir, "stage1")
        save_checkpoint(out, {
            "params": params,
            "batch_stats": stats,
            "vq_l": vq_l,
            "vq_h": vq_h,
            "step": np.asarray(0),
        }, meta={
            "config": dataclasses.asdict(cfg),
            "input_length": inferred["input_length"],
            "in_channels": inferred["in_channels"],
            "n_classes": int(n_classes),
            "imported_from": os.path.abspath(args.stage1_ckpt),
        })
        print(f"[import] wrote {out}")

    if args.stage2_ckpt:
        p2, h_stats, inf2 = stage2_from_state_dict(
            _load_torch(args.stage2_ckpt)
        )
        print(f"[import] stage2.ckpt: {inf2}")

        import jax

        from tvqvae_tpu.models.maskgit import MaskGITSpec, build_transformers
        from tvqvae_tpu.models.stage1 import Stage1Spec
        from tvqvae_tpu.train.stage2 import init_stage2

        spec1 = Stage1Spec.from_config(
            cfg, inferred["input_length"], inferred["in_channels"]
        )
        for kind, inf in (("lf", inf2["lf"]), ("hf", inf2["hf"])):
            want = spec1.tokens_l if kind == "lf" else spec1.tokens_h
            if inf["num_tokens"] != want:
                raise SystemExit(
                    f"stage2 {kind}: prior trained on {inf['num_tokens']} "
                    f"tokens but the stage-1 geometry yields {want} — "
                    "stage-1/stage-2 checkpoints are from different runs?"
                )
        mg = MaskGITSpec.from_config(cfg, spec1)
        t_l, t_h = build_transformers(
            cfg, spec1, int(inf2["lf"]["n_classes"]),
            force_projections=inf2["force_projections"],
        )
        f_params, f_hstats = init_stage2(jax.random.key(0), t_l, t_h, mg)
        _assert_same_tree(
            {"params": p2, "h_stats": h_stats},
            {"params": jax.tree.map(np.asarray, f_params),
             "h_stats": jax.tree.map(np.asarray, f_hstats)},
            "stage2", inf2,
        )
        out = os.path.join(args.out_dir, "stage2")
        save_checkpoint(out, {
            "params": p2,
            "h_stats": h_stats,
            "step": np.asarray(0),
        }, meta={
            "config": dataclasses.asdict(cfg),
            "n_classes": int(inf2["lf"]["n_classes"]),
            "force_projections": inf2["force_projections"],
            "imported_from": os.path.abspath(args.stage2_ckpt),
        })
        print(f"[import] wrote {out}")

    if args.stage3_ckpt:
        fe_params, tau, fe_inferred = fe_from_state_dict(
            _load_torch(args.stage3_ckpt)
        )
        print(f"[import] stage3.ckpt: {fe_inferred}")
        if fe_inferred["in_channels"] != inferred["in_channels"]:
            raise SystemExit(
                f"stage3: FE channels {fe_inferred['in_channels']} != "
                f"stage-1 in_channels {inferred['in_channels']}"
            )

        import jax

        from tvqvae_tpu.models.fidelity_enhancer import FidelityEnhancer

        # GroupNorm group count is not recoverable from the weights —
        # it must come from the config, like the reference's own FE
        # reconstruction (sampler.py:95-108 rebuilds from config)
        fe = FidelityEnhancer(
            input_length=inferred["input_length"],
            in_channels=inferred["in_channels"],
            dim=cfg.fidelity_enhancer.dim,
            dim_mults=tuple(cfg.fidelity_enhancer.dim_mults),
            resnet_block_groups=cfg.fidelity_enhancer.resnet_block_groups,
            dropout=cfg.fidelity_enhancer.dropout,
        )
        x0 = np.zeros(
            (1, inferred["in_channels"], inferred["input_length"]), np.float32
        )
        fresh = fe.init(jax.random.key(0), x0, False)
        _assert_same_tree(fe_params, fresh["params"], "stage3", fe_inferred)
        out = os.path.join(args.out_dir, "stage3")
        save_checkpoint(out, {
            "params": fe_params,
            "tau": np.asarray(tau, np.float32),
            "step": np.asarray(0),
        }, meta={
            "config": dataclasses.asdict(cfg),
            "input_length": inferred["input_length"],
            "in_channels": inferred["in_channels"],
            "tau": tau,
            "imported_from": os.path.abspath(args.stage3_ckpt),
        })
        print(f"[import] wrote {out}")


if __name__ == "__main__":
    main()
