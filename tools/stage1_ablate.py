"""Attribute the stage-1 step time across pipeline segments (VERDICT r2
item 3: measured 56 ms vs a 38 ms aggregate-HLO floor at B=32 — find the
whale before attacking it).

Times drain-verified (bench.py methodology) jitted programs for nested
prefixes of the stage-1 training step, all at the published geometry:

  A  full training step (forward+backward+AdamW+EMA)       — the 56 ms
  B  full fwd+bwd, no optimizer update (grads materialized)
  C  fwd+bwd without the TimeHead dense(L,L) heads
  D  fwd+bwd encoders+VQ only (grad of a sum over quantized latents)
  E  forward only (no grads)
  F  targets only (STFT -> band split -> iSTFT -> interp, fwd)

Differences between consecutive rows attribute wall time to optimizer
(A-B), heads (B-C), decoders (C-D), encoder backward (D-E share), etc.
Each variant is its own compiled program, so fusion boundaries differ —
treat deltas as attribution, not exact kernel costs.

Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/stage1_ablate.py \
        [--batch 32] [--fp32] [--chunks 4] [--chunk 10]
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


def timed(fn, drain, chunks, chunk, tag=""):
    t0 = time.perf_counter()
    fn()
    drain()
    print(f"[ablate] {tag}: compiled+first in "
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
    ap.add_argument("--remat", action="store_true",
                    help="checkpoint conv blocks (tests the activation-"
                         "traffic lever on the memory-bound step)")
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=10)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (sanity runs; the image "
                    "pre-imports jax, so the JAX_PLATFORMS env var is "
                    "ineffective — must go through jax.config)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import optax

    from tvqvae_tpu.config import Config
    from tvqvae_tpu.models.stage1 import Stage1Spec, init_stage1, stage1_losses
    from tvqvae_tpu.models.vq import vq_forward
    from tvqvae_tpu.ops import (
        time_to_timefreq,
        timefreq_to_time,
        zero_pad_high_freq,
        zero_pad_low_freq,
    )
    from tvqvae_tpu.ops.interp import interp_linear
    from tvqvae_tpu.train.stage1 import (
        create_stage1_state,
        make_stage1_train_step,
    )
    from tvqvae_tpu.utils import warmup_cosine_schedule

    B, C, L = args.batch, 4, args.length
    cfg = Config()  # full published config defaults
    spec = Stage1Spec.from_config(
        cfg, L, C,
        compute_dtype="float32" if args.fp32 else "bfloat16",
        remat=args.remat,
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, C, L)), jnp.float32
    )
    model, params, batch_stats, vq_l, vq_h = init_stage1(
        jax.random.key(0), spec, x
    )
    tx = optax.adamw(warmup_cosine_schedule(1e-3, 50000), weight_decay=0.01)
    state = create_stage1_state(params, batch_stats, vq_l, vq_h, tx)
    rng = jax.random.key(1)
    res = {}

    def scalar_drain(box):
        def d():
            return float(jnp.sum(jax.tree.leaves(box[0])[0].astype(jnp.float32)))
        return d

    # --- A: full step --------------------------------------------------
    step = jax.jit(make_stage1_train_step(model, tx), donate_argnums=0)
    sbox = [state]

    def run_a():
        sbox[0], m = step(sbox[0], x, rng)

    def drain_a():
        return float(jnp.sum(jax.tree.leaves(sbox[0].params)[0]))

    res["A_full_step"] = timed(run_a, drain_a, args.chunks, args.chunk, "A")
    state = sbox[0]

    # --- B: fwd+bwd, no optimizer --------------------------------------
    def loss_full(p, bs, vl, vh):
        out, _ = model.apply(
            {"params": p, "batch_stats": bs}, x, vl, vh, True,
            rngs={"dropout": rng}, mutable=["batch_stats"],
        )
        total, _ = stage1_losses(out)
        return total

    gb = jax.jit(jax.grad(loss_full))
    box = [None]

    def run_b():
        box[0] = gb(state.params, state.batch_stats, state.vq_l, state.vq_h)

    res["B_fwd_bwd"] = timed(run_b, scalar_drain(box), args.chunks, args.chunk, "B")

    # --- C: fwd+bwd without TimeHead (stop before heads) ----------------
    def loss_noheads(p, bs, vl, vh):
        def fwd(mdl, xx):
            xf = time_to_timefreq(xx, spec.n_fft)
            tgt_l = interp_linear(
                timefreq_to_time(zero_pad_high_freq(xf), spec.n_fft), L
            )
            tgt_h = interp_linear(
                timefreq_to_time(zero_pad_low_freq(xf), spec.n_fft), L
            )
            z_l = mdl.encode(xx, "lf", True)
            o_l = vq_forward(vl, z_l, spec.vq_l, train=True)
            # decode WITHOUT TimeHead: replicate Stage1Model.decode minus head
            H, W = spec.hw_l
            u = mdl.decoder_l(
                o_l.quantized.reshape(B, H, W, spec.hid_dim), True
            )
            u = jnp.transpose(u, (0, 3, 1, 2))
            xt_l = timefreq_to_time(zero_pad_high_freq(u), spec.n_fft)
            z_h = mdl.encode(xx, "hf", True)
            o_h = vq_forward(vh, z_h, spec.vq_h, train=True)
            H2, W2 = spec.hw_h
            u2 = mdl.decoder_h(
                o_h.quantized.reshape(B, H2, W2, spec.hid_dim), True
            )
            u2 = jnp.transpose(u2, (0, 3, 1, 2))
            xt_h = timefreq_to_time(zero_pad_low_freq(u2), spec.n_fft)
            # proxy L2 against cropped targets (head's resize skipped)
            n = min(xt_l.shape[-1], L)
            return (
                jnp.mean((xt_l[..., :n] - tgt_l[..., :n]) ** 2)
                + jnp.mean(jnp.abs(xt_h[..., :n] - tgt_h[..., :n]))
                + o_l.loss + o_h.loss
            )

        out = nnlike_apply(p, bs, fwd)
        return out

    def nnlike_apply(p, bs, fwd):
        return model.apply(
            {"params": p, "batch_stats": bs},
            method=lambda mdl: fwd(mdl, x),
            rngs={"dropout": rng}, mutable=["batch_stats"],
        )[0]

    gc = jax.jit(jax.grad(loss_noheads))

    def run_c():
        box[0] = gc(state.params, state.batch_stats, state.vq_l, state.vq_h)

    res["C_no_heads"] = timed(run_c, scalar_drain(box), args.chunks, args.chunk, "C")

    # --- D: encoders+VQ only (grad wrt params of commit loss + sum(zq)) -
    def loss_enc(p, bs, vl, vh):
        def fwd(mdl, xx):
            z_l = mdl.encode(xx, "lf", True)
            o_l = vq_forward(vl, z_l, spec.vq_l, train=True)
            z_h = mdl.encode(xx, "hf", True)
            o_h = vq_forward(vh, z_h, spec.vq_h, train=True)
            return (jnp.mean(o_l.quantized ** 2) + jnp.mean(o_h.quantized ** 2)
                    + o_l.loss + o_h.loss)

        return model.apply(
            {"params": p, "batch_stats": bs},
            method=lambda mdl: fwd(mdl, x),
            rngs={"dropout": rng}, mutable=["batch_stats"],
        )[0]

    gd = jax.jit(jax.grad(loss_enc))

    def run_d():
        box[0] = gd(state.params, state.batch_stats, state.vq_l, state.vq_h)

    res["D_encoders_vq"] = timed(run_d, scalar_drain(box),
                                 args.chunks, args.chunk, "D")

    # --- E: forward only -------------------------------------------------
    fwd_only = jax.jit(
        lambda p, bs, vl, vh: stage1_losses(
            model.apply({"params": p, "batch_stats": bs}, x, vl, vh, False)
        )[0]
    )

    def run_e():
        box[0] = fwd_only(state.params, state.batch_stats,
                          state.vq_l, state.vq_h)

    def drain_e():
        return float(box[0])

    res["E_forward_only"] = timed(run_e, drain_e, args.chunks, args.chunk, "E")

    # --- F: targets only --------------------------------------------------
    def targets(xx):
        xf = time_to_timefreq(xx, spec.n_fft)
        a = interp_linear(
            timefreq_to_time(zero_pad_high_freq(xf), spec.n_fft), L
        )
        b = interp_linear(
            timefreq_to_time(zero_pad_low_freq(xf), spec.n_fft), L
        )
        return jnp.sum(a) + jnp.sum(b)

    tf = jax.jit(targets)

    def run_f():
        box[0] = tf(x)

    res["F_targets_only"] = timed(run_f, drain_e, args.chunks, args.chunk, "F")

    print("ABLATE " + json.dumps({
        "batch": B, "length": L,
        "dtype": "fp32" if args.fp32 else "bf16",
        "remat": bool(args.remat),
        **{k: v for k, v in res.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
