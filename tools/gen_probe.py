"""Generation-pipeline decomposition: where do the ~47 ms per 256-batch go?

The round-5 generation roofline (tools/roofline.py --generation) showed the
sampler at ~30% of its HBM floor — not bandwidth-bound. This probe splits
the ONE jitted production program (train/stage2.make_sampling_fn: T_l=10
CFG decode scan + T_h=1 + dual stage-1 decoders + band sum) into separately
jitted, separately drained pieces:

  full    — the production program (the bench.py generation headline)
  tokens  — models/maskgit.iterative_decoding only (both prior scans)
  decode  — decode_tokens for both bands + sum, from fixed token arrays

tokens + decode > full is expected (the fused program overlaps them and
skips one HBM round trip of the token arrays); the split bounds each side.

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/gen_probe.py \
      [--gb 256] [--no-bf16_head] [--fp32]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gb", type=int, default=256)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--bf16_head", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--bf16_istft", action="store_true",
                    help="decode-side bf16 overlap-add (Stage1Spec."
                         "bf16_istft) — the generation roofline's top "
                         "traffic lever")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from bench import _enable_compilation_cache, setup_stage1

    _enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from tvqvae_tpu.config import Config
    from tvqvae_tpu.models.maskgit import (
        FrozenStage1,
        MaskGITSpec,
        build_transformers,
        decode_tokens,
        iterative_decoding,
    )
    from tvqvae_tpu.models.stage1 import Stage1Model
    from tvqvae_tpu.train.stage2 import init_stage2, make_sampling_fn

    cfg = Config()
    dd = "float32" if args.fp32 else "bfloat16"
    spec, model, _, s1_state, _ = setup_stage1(
        cfg, 32, 4, 4633, compute_dtype=dd, fast_bn=True,
        bf16_head=args.bf16_head,
    )
    if args.bf16_istft:
        import dataclasses

        spec = dataclasses.replace(spec, bf16_istft=True)
    frozen = FrozenStage1(
        params=s1_state.params, batch_stats=s1_state.batch_stats,
        vq_l=s1_state.vq_l, vq_h=s1_state.vq_h,
    )
    mg = MaskGITSpec.from_config(cfg, spec)
    t_l, t_h = build_transformers(cfg, spec, n_classes=5)
    p2, h_stats = init_stage2(jax.random.key(2), t_l, t_h, mg)
    stage1_model = Stage1Model(spec)
    GB = args.gb

    sample_fn = make_sampling_fn(stage1_model, t_l, t_h, mg)

    @jax.jit
    def tokens_fn(params, h_st, rng):
        def apply_l(s_l, cond):
            return t_l.apply({"params": params["l"]}, s_l, None, cond, False)

        def apply_h(s_l, s_h, cond):
            return t_h.apply({"params": params["h"], "batch_stats": h_st},
                             s_l, s_h, cond, False)

        return iterative_decoding(rng, mg, apply_l, apply_h, GB, None)

    @jax.jit
    def decode_fn(fz, s_l, s_h):
        x_l = decode_tokens(stage1_model, fz, s_l, "lf")
        x_h = decode_tokens(stage1_model, fz, s_h, "hf")
        return x_l + x_h

    def timed(label, fn, drain, iters):
        out = fn()
        drain(out)  # compile + true completion
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        drain(out)  # un-fakeable device->host fetch (PERF.md correction)
        ms = (time.perf_counter() - t0) / iters * 1e3
        return round(ms, 2)

    drain_x = lambda o: float(jnp.sum(jax.tree.leaves(o)[0][:2]))

    rows = {}
    rows["full_ms"] = timed(
        "full",
        lambda: sample_fn(frozen, p2, h_stats, jax.random.key(3), GB, None),
        drain_x, args.iters,
    )
    rows["tokens_ms"] = timed(
        "tokens",
        lambda: tokens_fn(p2, h_stats, jax.random.key(3)),
        lambda o: float(jnp.sum(o[0][:2])), args.iters,
    )
    s_l, s_h = tokens_fn(p2, h_stats, jax.random.key(3))
    s_l, s_h = jax.block_until_ready((s_l, s_h))
    rows["decode_ms"] = timed(
        "decode",
        lambda: decode_fn(frozen, s_l, s_h),
        drain_x, args.iters,
    )
    rows["gb"] = GB
    rows["dtype"] = dd
    rows["bf16_head"] = bool(args.bf16_head)
    rows["bf16_istft"] = bool(args.bf16_istft)
    rows["decode_steps"] = {"lf": mg.T_l, "hf": mg.T_h}
    rows["traj_per_sec_full"] = round(GB / rows["full_ms"] * 1e3, 1)
    rows["tokens_share_of_full"] = round(rows["tokens_ms"] / rows["full_ms"], 3)
    rows["decode_share_of_full"] = round(rows["decode_ms"] / rows["full_ms"], 3)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
