"""Probe: can packing the LF+HF encoder conv stacks into ONE grouped-conv
stack close the stage-1 B=32 latency gap? (VERDICT r2 item 3.)

The two band encoders are architecturally identical for the first
`halvings_h` width-halvings and differ only in weights. Because every
non-conv op in the stack is per-channel (BatchNorm statistics, Snake,
dropout), concatenating the two bands along channels and using
`feature_group_count=2` block-diagonal convs computes EXACTLY the same
function as running the stacks separately — with half the kernel count and
half the lane-padding waste on the narrow-channel early layers (C=4 pads
to the 128-lane tile, so (32,3,4634,4)+(32,3,4634,4) padded occupies 2x
the HBM bytes of one packed (32,3,4634,8)).

This probe times fwd+bwd of (a) two separate mirrored encoder stacks and
(b) the packed grouped equivalent, with random weights (pure timing — the
numerics equivalence is elementary). If (b) wins well beyond noise, the
packing is worth integrating into Stage1Model.

Run on the real chip:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/bandpack_probe.py
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--width", type=int, default=4634)
    ap.add_argument("--halvings", type=int, default=7,
                    help="shared-depth prefix (published hf=7)")
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    B, H, W = args.batch, 3, args.width
    Cin = 8  # 2C spectral channels per band
    dt = jnp.bfloat16

    # channel schedule mirroring VQVAEEncoder at init_dim=4
    chans = [4 * 2 ** i for i in range(args.halvings)]

    def make_params(key, groups):
        ps = []
        cin = Cin
        for co in chans:
            key, k1, k2, k3 = jax.random.split(key, 4)
            ps.append({
                "w": jax.random.normal(
                    k1, (3, 3, cin * groups // groups, co * groups), dt
                ) * 0.05,
                "scale": jnp.ones((co * groups,), jnp.float32),
                "bias": jnp.zeros((co * groups,), jnp.float32),
                "alpha": jax.random.uniform(k3, (co * groups,), jnp.float32,
                                            0.2, 0.5),
            })
            cin = co
        return ps

    def stack(x, ps, groups):
        # x: (B, H, W, Cin*groups)
        for p in ps:
            x = jax.lax.conv_general_dilated(
                x.astype(dt), p["w"], window_strides=(1, 2),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups,
            )
            # BN (training stats) + snake, per-channel
            m = jnp.mean(x.astype(jnp.float32), axis=(0, 1, 2))
            v = jnp.var(x.astype(jnp.float32), axis=(0, 1, 2))
            xn = (x.astype(jnp.float32) - m) * jax.lax.rsqrt(v + 1e-5)
            xn = xn * p["scale"] + p["bias"]
            a = p["alpha"]
            x = (xn + jnp.sin(a * xn) ** 2 / a).astype(dt)
        return x

    key = jax.random.key(0)
    x1 = jax.random.normal(jax.random.key(1), (B, H, W, Cin), dt)
    x2 = jax.random.normal(jax.random.key(2), (B, H, W, Cin), dt)
    ps_a = make_params(jax.random.key(3), 1)
    ps_b = make_params(jax.random.key(4), 1)
    ps_pk = make_params(jax.random.key(5), 2)

    def loss_sep(ps2, xa, xb):
        pa, pb = ps2
        return (jnp.sum(stack(xa, pa, 1).astype(jnp.float32))
                + jnp.sum(stack(xb, pb, 1).astype(jnp.float32)))

    def loss_pack(ps, xab):
        return jnp.sum(stack(xab, ps, 2).astype(jnp.float32))

    g_sep = jax.jit(jax.grad(loss_sep))
    g_pack = jax.jit(jax.grad(loss_pack))
    xab = jnp.concatenate([x1, x2], axis=-1)

    def timed(fn, tag):
        box = [None]
        t0 = time.perf_counter()
        box[0] = fn()
        d = float(jnp.sum(jax.tree.leaves(box[0])[0].astype(jnp.float32)))
        print(f"[bandpack] {tag} compiled+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        out = []
        for _ in range(args.chunks):
            t0 = time.perf_counter()
            for _ in range(args.chunk):
                box[0] = fn()
            float(jnp.sum(jax.tree.leaves(box[0])[0].astype(jnp.float32)))
            out.append((time.perf_counter() - t0) / args.chunk * 1e3)
        return float(np.percentile(out, 50))

    sep_ms = timed(lambda: g_sep((ps_a, ps_b), x1, x2), "separate")
    pack_ms = timed(lambda: g_pack(ps_pk, xab), "packed")
    print("BANDPACK " + json.dumps({
        "batch": B, "width": W, "halvings": args.halvings,
        "separate_p50_ms": round(sep_ms, 3),
        "packed_p50_ms": round(pack_ms, 3),
        "speedup": round(sep_ms / max(pack_ms, 1e-9), 3),
    }), flush=True)


if __name__ == "__main__":
    main()
