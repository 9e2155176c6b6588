"""Quantify the dropout-RNG share of the stage-1 step (roofline-gap lever).

The conv stacks apply dropout(0.3) to (B, 3, W, C) activations at many
sites (reference vq_vae.py conv blocks; config encoder/decoder dropout).
Each site draws a bernoulli mask over tens of millions of elements; JAX's
default threefry2x32 PRNG spends ~dozens of VPU ops per draw, which on a
memory-bound step can be a real slice of wall-clock. XLA's counter-based
`rbg` generator is ~10x cheaper per draw (quality is ample for dropout
masks). This probe times the identical jitted stage-1 train step under:

  A  default threefry dropout keys        (the production default)
  B  rbg dropout keys (jax.random.key(impl='rbg'))
  C  dropout disabled (rate 0 -> flax skips mask generation entirely)

A-C bounds the total dropout cost; A-B is the free win available by
switching the dropout key impl. Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/dropout_probe.py
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get(
                      "JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".cache", "jax")))


def timed(fn, drain, chunks, chunk, tag):
    t0 = time.perf_counter()
    fn()
    drain()
    print(f"[dropout_probe] {tag}: compiled+first in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    out = []
    for _ in range(chunks):
        t0 = time.perf_counter()
        for _ in range(chunk):
            fn()
        drain()
        out.append((time.perf_counter() - t0) / chunk * 1e3)
    return {
        "p50_ms": float(np.percentile(out, 50)),
        "p10_ms": float(np.percentile(out, 10)),
        "p90_ms": float(np.percentile(out, 90)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--length", type=int, default=4633)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import jax.numpy as jnp
    import optax

    from tvqvae_tpu.config import Config
    from tvqvae_tpu.models.stage1 import Stage1Spec, init_stage1
    from tvqvae_tpu.train.stage1 import (
        create_stage1_state,
        make_stage1_train_step,
    )
    from tvqvae_tpu.utils import warmup_cosine_schedule

    B, C, L = args.batch, 4, args.length
    cfg = Config()
    dtype = "float32" if args.fp32 else "bfloat16"
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, C, L)), jnp.float32
    )
    res = {}

    def run_variant(tag, spec, key_impl=None):
        model, params, batch_stats, vq_l, vq_h = init_stage1(
            jax.random.key(0), spec, x
        )
        tx = optax.adamw(
            warmup_cosine_schedule(1e-3, 50000), weight_decay=0.01
        )
        state = create_stage1_state(params, batch_stats, vq_l, vq_h, tx)
        rng = (jax.random.key(1) if key_impl is None
               else jax.random.key(1, impl=key_impl))
        step = jax.jit(make_stage1_train_step(model, tx), donate_argnums=0)
        sbox = [state]

        def one():
            sbox[0], _ = step(sbox[0], x, rng)

        def drain():
            return float(jnp.sum(jax.tree.leaves(sbox[0].params)[0]))

        res[tag] = timed(one, drain, args.chunks, args.chunk, tag)

    spec = Stage1Spec.from_config(cfg, L, C, compute_dtype=dtype)
    run_variant("A_threefry", spec)
    run_variant("B_rbg", spec, key_impl="rbg")
    spec0 = dataclasses.replace(spec, dropout_enc=0.0, dropout_dec=0.0)
    run_variant("C_no_dropout", spec0)

    print("DROPOUT_PROBE " + json.dumps({
        "batch": B, "length": L, "dtype": dtype, **res
    }), flush=True)


if __name__ == "__main__":
    main()
