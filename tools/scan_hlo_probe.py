"""Diagnose the stage-1 bundled-scan regression (VERDICT r3 item 2).

Round-3 measured the bundle=10 lax.scan body at 72 ms/step vs 56 ms for
the sequential per-step program at full geometry (PERF.md "Bundled
stepping"), cause undiagnosed. This probe AOT-compiles BOTH programs on
the chip backend (no execution, no data upload — `jit(...).lower()` on
ShapeDtypeStructs) and compares the optimized HLO:

  - XLA cost analysis (flops / bytes accessed), normalized per optimizer
    step — if scan bytes/step > sequential bytes/step, the scan is paying
    real extra HBM traffic, not dispatch overhead;
  - instruction census of the while-loop body vs the sequential entry
    (fusion count, conv count, copy count + the shapes being copied) —
    `copy` of parameter/state-sized buffers inside the body is the
    layout-assignment signature; fewer fusions per conv is the
    lost-fusion signature.

Full HLO text is dumped beside --outdir for hand inspection.

Run on the chip (the compile cache makes repeats cheap):

    PYTHONPATH=/root/repo python tools/scan_hlo_probe.py \
        [--bundle 10] [--outdir /tmp/hloprobe] [--cpu] [--small]
"""

import argparse
import collections
import json
import os
import re
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 os.path.join(REPO, ".cache", "jax")))


def census(hlo: str):
    """Instruction counts by opcode over an optimized-HLO text dump, plus
    every copy/transpose with a >=1M-element operand (the layout-copy
    signature at stage-1 scale: params are 181.4M elements total)."""
    ops = collections.Counter()
    big_copies = []
    for m in re.finditer(r"^\s*(?:ROOT )?%?[\w.\-]+ = "
                         r"((?:[a-z0-9]+)\[[0-9,]*\][^ ]*) "
                         r"([a-z\-]+)\(", hlo, re.M):
        shape, op = m.group(1), m.group(2)
        ops[op] += 1
        if op in ("copy", "transpose"):
            dims = re.search(r"\[([0-9,]*)\]", shape)
            n = 1
            for d in (dims.group(1).split(",") if dims and dims.group(1)
                      else []):
                n *= int(d)
            if n >= 1 << 20:
                big_copies.append({"op": op, "shape": shape, "elems": n})
    return ops, big_copies


def while_body(hlo: str):
    """Extract the largest while-loop body computation (the scan body)."""
    best = ""
    for m in re.finditer(r"^%?([\w.\-]*body[\w.\-]*) \([^)]*\) -> ",
                         hlo, re.M):
        start = m.start()
        end = hlo.find("\n}\n", start)
        blk = hlo[start:end if end > 0 else len(hlo)]
        if len(blk) > len(best):
            best = blk
    return best or hlo


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bundle", type=int, default=10)
    ap.add_argument("--outdir", default="/tmp/hloprobe")
    ap.add_argument("--cpu", action="store_true",
                    help="compile on CPU instead of the chip (structure "
                         "differs from the TPU pipeline; for smoke tests)")
    ap.add_argument("--small", action="store_true",
                    help="L=512/hid-64 instead of the published geometry")
    ap.add_argument("--bf16_mu", action=argparse.BooleanOptionalAction,
                    default=True)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from tvqvae_tpu.config import Config
    from tvqvae_tpu.models.vqvae import Stage1Spec
    from tvqvae_tpu.parallel.mesh import make_mesh
    from tvqvae_tpu.train import runner
    from tvqvae_tpu.train.stage1 import (
        create_stage1_state, init_stage1, make_stage1_train_step,
    )

    L, hid = (512, 64) if args.small else (4633, 128)
    N, B, C = 5932, 32, 4
    # defaults ARE the published geometry (hid 128, B=32); --small shrinks
    cfg = Config.from_dict({"encoder": {"hid_dim": hid}})
    spec = Stage1Spec.from_config(cfg, L, C, compute_dtype="bfloat16",
                                  fast_bn=True)
    mesh = make_mesh()
    t0 = time.time()
    x0 = jnp.zeros((B, C, L), jnp.float32)
    model, params, batch_stats, vq_l, vq_h = init_stage1(
        jax.random.key(0), spec, x0
    )
    tx = runner._adamw(cfg, 50000, bf16_mu=args.bf16_mu)
    state = create_stage1_state(params, batch_stats, vq_l, vq_h, tx)
    print(f"init {time.time() - t0:.1f}s", flush=True)

    dstep = runner.make_device_data_step(
        make_stage1_train_step(model, tx), mesh, N, B
    )
    sds = lambda t: jax.tree.map(  # noqa: E731
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), t
    )
    X_sds = jax.ShapeDtypeStruct((N, C, L), jnp.float32)
    key_sds = jax.random.key(1)  # keys are cheap; pass real ones
    os.makedirs(args.outdir, exist_ok=True)
    report = {"bundle": args.bundle, "geometry": {"L": L, "hid": hid},
              "backend": jax.default_backend()}

    for name, fn, steps in (
        ("seq", dstep, 1),
        ("scan", runner.make_multistep(dstep, args.bundle), args.bundle),
    ):
        t0 = time.time()
        lowered = jax.jit(fn, donate_argnums=0).lower(
            sds(state), (X_sds,), key_sds, key_sds
        )
        compiled = lowered.compile()
        t_compile = time.time() - t0
        hlo = compiled.as_text()
        path = os.path.join(args.outdir, f"stage1_{name}.hlo.txt")
        with open(path, "w") as f:
            f.write(hlo)
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        body = while_body(hlo) if name == "scan" else hlo
        ops, big_copies = census(body)
        report[name] = {
            "compile_s": round(t_compile, 1),
            "flops_per_step": (ca.get("flops", 0) or 0) / steps,
            "bytes_per_step": (ca.get("bytes accessed", 0) or 0) / steps,
            "hlo_path": path,
            "hlo_mb": round(len(hlo) / 1e6, 1),
            "body_ops": {k: v for k, v in ops.most_common(15)},
            "body_big_copies": big_copies[:20],
            "body_big_copy_count": len(big_copies),
        }
        print(json.dumps({name: report[name]}), flush=True)

    seq_b = report["seq"]["bytes_per_step"]
    scan_b = report["scan"]["bytes_per_step"]
    if seq_b:
        report["scan_vs_seq_bytes_ratio"] = round(scan_b / seq_b, 3)
    print("SUMMARY " + json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
