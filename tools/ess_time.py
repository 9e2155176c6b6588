"""Drain-verified ESS vs plain sampler timing on trained checkpoints
(VERDICT r2 item 5: the earlier 264.8/643.7 ms figures were taken with the
invalidated block_until_ready methodology).

Times `TrainedModelSampler._sample_batch` per 32-batch with ESS on and off,
ending every timed chunk with a device->host value fetch (the un-fakeable
drain from bench.py), and reports chunked p10/p50/p90. Run on the real chip
against any trained stage-1/2 checkpoints:

    PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=\
/tmp/jaxcache python tools/ess_time.py --ckpt /tmp/fullrun/models \
        [--batch 32] [--chunks 5] [--chunk 4]

Prints one JSON line with both timings.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)


def timed(sampler, batch, chunks, chunk, seed0):
    import jax
    import jax.numpy as jnp

    out_box = [None]

    def one(i):
        out_box[0] = sampler._sample_batch(
            jax.random.key(seed0 + i), batch, None
        )

    def drain():
        return float(jnp.sum(jax.tree.leaves(out_box[0])[0].astype(jnp.float32)))

    one(0)
    drain()  # compile + settle
    rates = []
    k = 1
    for _ in range(chunks):
        t0 = time.perf_counter()
        for _ in range(chunk):
            one(k)
            k += 1
        drain()
        rates.append((time.perf_counter() - t0) / chunk * 1e3)
    return {
        "ms_p10": float(np.percentile(rates, 10)),
        "ms_p50": float(np.percentile(rates, 50)),
        "ms_p90": float(np.percentile(rates, 90)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="dir containing stage1/ and stage2/ checkpoints")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--chunks", type=int, default=5)
    ap.add_argument("--chunk", type=int, default=4)
    ap.add_argument("--config", default="",
                    help="optional yaml overrides (else checkpoint meta)")
    args = ap.parse_args()

    from tvqvae_tpu.config import Config
    from tvqvae_tpu.generation import TrainedModelSampler

    cfg = Config.from_yaml(args.config) if args.config else Config()
    s1 = os.path.join(args.ckpt, "stage1")
    s2 = os.path.join(args.ckpt, "stage2")

    plain = TrainedModelSampler(cfg, s1, s2, batch_size=args.batch)
    r_plain = timed(plain, args.batch, args.chunks, args.chunk, 100)

    ess_cfg = dataclasses.replace(
        cfg, maskgit=dataclasses.replace(cfg.maskgit, ess_use=True)
    )
    ess = TrainedModelSampler(ess_cfg, s1, s2, batch_size=args.batch)
    r_ess = timed(ess, args.batch, args.chunks, args.chunk, 200)

    print(json.dumps({
        "batch": args.batch,
        "plain_ms_per_batch": r_plain,
        "ess_ms_per_batch": r_ess,
        "ess_over_plain_p50": round(r_ess["ms_p50"] / r_plain["ms_p50"], 2),
        "methodology": "drain-verified (value fetch per chunk)",
    }))


if __name__ == "__main__":
    main()
