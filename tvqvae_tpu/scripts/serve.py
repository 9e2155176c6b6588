"""Serve CLI: run a trained generator as an HTTP service.

    serve --dataset_file data/real/OpenSky_EHAM_LIMC.npz \
          --model_save_dir saved_models --port 8080 [--use_fe] [--warm_classes]

Loads the stage checkpoints exactly like the generate CLI (reference
scripts/generate.py:129-156 surface), fits nothing: the training scaler is
re-derived from the dataset file so responses come back in original
physical units. See tvqvae_tpu/serving/ for the service/endpoint contract.
"""

import argparse
import os
from pathlib import Path

from tvqvae_tpu.config import Config
from tvqvae_tpu.data import get_data
from tvqvae_tpu.generation import TrainedModelSampler
from tvqvae_tpu.serving import GenerationService, serve_forever


def main(argv=None):
    p = argparse.ArgumentParser(description="Serve a trained generator")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--dataset_file", type=str, required=True,
                   help="training dataset (provides the scaler + features "
                        "for original-unit responses)")
    p.add_argument("--model_save_dir", type=str, default="saved_models")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--use_fe", action="store_true",
                   help="serve fidelity-enhanced samples (needs stage3)")
    p.add_argument("--max_request", type=int, default=4096)
    p.add_argument("--warm_classes", action="store_true",
                   help="also pre-compile the per-class conditional programs")
    p.add_argument("--no_warmup", action="store_true")
    p.add_argument("--bf16", action="store_true",
                   help="serve with bfloat16 decode conv stacks (and FE)")
    p.add_argument("--fast_bn", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="BN normalization in the compute dtype (default ON "
                        "to match training since round 3; identical math "
                        "at fp32, faster under --bf16; checkpoint trees "
                        "are unaffected either way — --no-fast_bn opts "
                        "out)")
    p.add_argument("--data_parallel", action="store_true",
                   help="fan generation out over all local devices via a "
                        "1-D data mesh (batch_size must divide the device "
                        "count; single-device serving needs no flag)")
    p.add_argument("--coalesce_ms", type=float, default=None,
                   help="merge concurrent same-class seedless requests "
                        "arriving within this window into one device batch "
                        "(the sampler pays a full batch per call, so this "
                        "is ~k x throughput for k concurrent small "
                        "requests)")
    args = p.parse_args(argv)

    cfg = Config.from_yaml(args.config) if args.config else Config()
    data = get_data(args.dataset_file, cfg.dataset.features,
                    scale=cfg.dataset.data_scaling)
    ckpt = os.path.join(args.model_save_dir, Path(args.dataset_file).stem)

    mesh = None
    if args.data_parallel:
        from tvqvae_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        n_dev = mesh.devices.size
        if args.batch_size % n_dev:
            p.error(f"--batch_size {args.batch_size} must divide the "
                    f"device count {n_dev}")
        print(f"[serve] data-parallel over {n_dev} devices", flush=True)

    stage3 = os.path.join(ckpt, "stage3")
    sampler = TrainedModelSampler(
        cfg,
        os.path.join(ckpt, "stage1"),
        os.path.join(ckpt, "stage2"),
        stage3_ckpt=stage3 if (args.use_fe and os.path.exists(stage3)) else None,
        use_fidelity_enhancer=args.use_fe,
        batch_size=args.batch_size,
        mesh=mesh,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        fast_bn=args.fast_bn,
    )
    service = GenerationService(
        sampler,
        scaler=data.scaler if cfg.dataset.data_scaling else None,
        features=cfg.dataset.features,
        max_request=args.max_request,
        coalesce_ms=args.coalesce_ms,
    )
    if not args.no_warmup:
        print("[serve] warming decode programs...", flush=True)
        service.warmup(classes=args.warm_classes)
    serve_forever(service, args.host, args.port)


if __name__ == "__main__":
    main()
