"""Stage-1 dispatch-gap probe (VERDICT r4 work item 2).

Round 3 measured the production stage-1 loop at 10.4 steps/s against a
drain-verified 17.8 steps/s device step (PERF.md full-geometry table) —
80 of 117 run minutes were NOT device time. This probe isolates where the
per-step wall clock goes, at the published geometry, all on-device data:

  A. bench-style loop: fixed input batch, per-step dispatch, drain per
     chunk — the number bench.py reports (expect ~17.8 steps/s bf16).
  B. runner-style loop: the REAL make_device_data_step program (on-device
     batch gather from the uploaded train split) dispatched per step with
     the runner's emit/StepTimer plumbing around it, logger off — isolates
     the loop-shape overhead from the device program.
  C. dispatch-return histogram: host time for each gstep() call to RETURN
     (not complete) — if p50 is ~milliseconds the dispatch is async and
     the gap is device-side or queue-depth; if p50 is tens of ms the
     enqueue RPC itself is synchronous on this tunneled backend and
     host-side batching (bundling / fewer dispatches) is the only lever.
  D. AOT variant: the same program called via .lower().compile() —
     skips jit-dispatch cache lookup; measures pure call overhead delta.
  E. (--bundle K) the bundled lax.scan loop at full geometry, drained
     honestly via a post-bundle value fetch, to reproduce/diagnose the
     round-3 regression (72 ms/step scan body vs 56 sequential). With
     --dump-hlo, writes both optimized HLO modules to --hlo-dir for fusion
     diffing.
  F. snapshot interference: the full run snapshots a ~2.2 GB train state
     at every val boundary (AsyncSnapshotter: on-device copy, then a
     worker thread fetches + writes). The fetch shares the tunnel with
     the dispatch stream — F measures the loop rate WITH one in-flight
     snapshot and the snapshot's own fetch+write wall-clock. If the rate
     collapses here, the round-3 "per-dispatch RTT" attribution was
     wrong and the fix is snapshot cadence/placement, not dispatch.

Usage (chip):
  python tools/dispatch_probe.py [--steps 200] [--bundle 10] [--dump-hlo]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--B", type=int, default=32)
    ap.add_argument("--L", type=int, default=4633)
    ap.add_argument("--C", type=int, default=4)
    ap.add_argument("--n_data", type=int, default=512)
    ap.add_argument("--bundle", type=int, default=0,
                    help="also measure the bundled lax.scan loop at this "
                         "stride")
    ap.add_argument("--dump-hlo", action="store_true")
    ap.add_argument("--hlo-dir", default="/tmp/dispatch_probe_hlo")
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--sections", default="ABCDEF",
                    help="which sections to run (string containing any of "
                         "A B C D E F); B/C/D/E/F share the runner-style "
                         "setup, A is independent")
    ap.add_argument("--cpu", action="store_true",
                    help="run on the CPU backend (correctness/smoke only)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    # persistent compile cache (same as bench.py)
    import os
    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".cache", "jax"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import setup_stage1, _state_drain, _chunk_rates
    from tvqvae_tpu.config import Config
    from tvqvae_tpu.parallel import make_mesh, replicate_tree
    from tvqvae_tpu.train import make_stage1_train_step
    from tvqvae_tpu.train.runner import (
        device_train_array,
        make_device_data_step,
        make_multistep,
    )

    cfg = Config()
    dtype = "float32" if args.fp32 else "bfloat16"
    B, C, L = args.B, args.C, args.L
    out = {"geometry": {"B": B, "C": C, "L": L, "dtype": dtype,
                        "fast_bn": True}}

    # ---- A: bench-style fixed-input loop --------------------------------
    if "A" in args.sections:
        _section_a(args, cfg, dtype, out)
    if set(args.sections) & set("BCDEF"):
        _sections_bcdef(args, cfg, dtype, out)
    print(json.dumps(out))


def _section_a(args, cfg, dtype, out):
    import jax
    import numpy as np

    from bench import setup_stage1, _state_drain, _chunk_rates

    B, C, L = args.B, args.C, args.L
    spec, model, step, state, x = setup_stage1(
        cfg, B, C, L, compute_dtype=dtype, fast_bn=True
    )
    rng = jax.random.key(1)
    for _ in range(15):
        state, _ = step(state, x, rng)
    box = [state]
    _state_drain(box)()

    def one_a():
        box[0], m = step(box[0], x, rng)
        return m

    rates = _chunk_rates(one_a, 4, 30, drain=_state_drain(box))
    out["A_bench_style_steps_per_sec_p50"] = round(
        float(np.percentile(rates, 50)), 2
    )
    del box, state


def _sections_bcdef(args, cfg, dtype, out):
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import setup_stage1, _state_drain
    from tvqvae_tpu.parallel import make_mesh, replicate_tree
    from tvqvae_tpu.train import make_stage1_train_step
    from tvqvae_tpu.train.runner import (
        device_train_array,
        make_device_data_step,
        make_multistep,
    )

    import os

    B, C, L = args.B, args.C, args.L
    rng = jax.random.key(1)

    # ---- B/C/D: runner-style device-data loop ---------------------------
    mesh = make_mesh()
    spec, model, _, state0, _ = setup_stage1(
        cfg, B, C, L, compute_dtype=dtype, fast_bn=True
    )
    X = np.random.default_rng(0).normal(
        size=(args.n_data, C, L)
    ).astype(np.float32)
    X_dev = device_train_array(mesh, X)
    data_key = jax.random.key(2)
    dstep = make_device_data_step(
        make_stage1_train_step(model, _tx(cfg)), mesh, args.n_data, B
    )
    gstep = jax.jit(dstep, donate_argnums=0)

    state = replicate_tree(mesh, state0)
    for _ in range(10):
        state, m = gstep(state, (X_dev,), data_key, rng)
    box = [state]
    _state_drain(box)()

    # C: dispatch-return times + B: end-to-end rate with emit plumbing
    if set(args.sections) & set("BC"):
        from tvqvae_tpu.utils.profiling import StepTimer

        timer = StepTimer()
        disp = []
        t0 = time.perf_counter()
        for i in range(args.steps):
            d0 = time.perf_counter()
            box[0], metrics = gstep(box[0], (X_dev,), data_key, rng)
            disp.append(time.perf_counter() - d0)
            timer.tick()  # runner emit() does this every step
        _state_drain(box)()
        wall = time.perf_counter() - t0
        out["B_runner_style_steps_per_sec"] = round(args.steps / wall, 2)
        out["C_dispatch_return_ms"] = {
            "p50": round(float(np.percentile(disp, 50)) * 1e3, 2),
            "p90": round(float(np.percentile(disp, 90)) * 1e3, 2),
            "max": round(float(np.max(disp)) * 1e3, 2),
            "mean": round(float(np.mean(disp)) * 1e3, 2),
        }

    # D: AOT-compiled call (skips jit dispatch-cache path)
    if "D" in args.sections:
        compiled = gstep.lower(box[0], (X_dev,), data_key, rng).compile()
        for _ in range(5):
            box[0], m = compiled(box[0], (X_dev,), data_key, rng)
        _state_drain(box)()
        dispd = []
        t0 = time.perf_counter()
        for i in range(min(args.steps, 100)):
            d0 = time.perf_counter()
            box[0], m = compiled(box[0], (X_dev,), data_key, rng)
            dispd.append(time.perf_counter() - d0)
        _state_drain(box)()
        wall_d = time.perf_counter() - t0
        out["D_aot_steps_per_sec"] = round(min(args.steps, 100) / wall_d, 2)
        out["D_aot_dispatch_return_ms_p50"] = round(
            float(np.percentile(dispd, 50)) * 1e3, 2
        )

        if args.dump_hlo:
            os.makedirs(args.hlo_dir, exist_ok=True)
            with open(f"{args.hlo_dir}/step.hlo", "w") as f:
                f.write(compiled.as_text())
            out["hlo_step"] = f"{args.hlo_dir}/step.hlo"

    # ---- F: snapshot interference ----------------------------------------
    if "F" in args.sections:
        _section_f(args, out, box, gstep, X_dev, data_key, rng)

    # ---- E: bundled scan loop -------------------------------------------
    if "E" in args.sections and args.bundle > 1:
        mstep = jax.jit(
            make_multistep(dstep, args.bundle), donate_argnums=0
        )
        for _ in range(3):
            box[0], m = mstep(box[0], (X_dev,), data_key, rng)
        _state_drain(box)()
        n_bundles = max(args.steps // args.bundle, 10)
        t0 = time.perf_counter()
        for _ in range(n_bundles):
            box[0], m = mstep(box[0], (X_dev,), data_key, rng)
        _state_drain(box)()
        wall_e = time.perf_counter() - t0
        out["E_bundled_steps_per_sec"] = round(
            n_bundles * args.bundle / wall_e, 2
        )
        out["E_bundle"] = args.bundle
        if args.dump_hlo:
            os.makedirs(args.hlo_dir, exist_ok=True)
            ce = mstep.lower(box[0], (X_dev,), data_key, rng).compile()
            with open(f"{args.hlo_dir}/bundled.hlo", "w") as f:
                f.write(ce.as_text())
            out["hlo_bundled"] = f"{args.hlo_dir}/bundled.hlo"


def _section_f(args, out, box, gstep, X_dev, data_key, rng):
    import os
    import tempfile
    import time

    import numpy as np

    from bench import _state_drain
    from tvqvae_tpu.utils.checkpoint import AsyncSnapshotter

    with tempfile.TemporaryDirectory() as td:
        snap = AsyncSnapshotter(os.path.join(td, "snap"))
        s0 = time.perf_counter()
        snap(box[0])  # on-device copy + background fetch/write
        copy_s = time.perf_counter() - s0
        n_f = min(args.steps, 100)
        t0 = time.perf_counter()
        for i in range(n_f):
            box[0], m = gstep(box[0], (X_dev,), data_key, rng)
            if i == n_f // 2:
                s2 = time.perf_counter()
                snap(box[0])  # skips if the first fetch is still in flight
                out["F_midloop_snapshot_call_s"] = round(
                    time.perf_counter() - s2, 3
                )
        _state_drain(box)()
        wall_f = time.perf_counter() - t0
        s1 = time.perf_counter()
        snap.join()
        join_wait_s = time.perf_counter() - s1
        out["F_steps_per_sec_with_snapshot_inflight"] = round(n_f / wall_f, 2)
        out["F_snapshot_device_copy_s"] = round(copy_s, 2)
        out["F_snapshot_total_fetch_write_s"] = round(
            copy_s + wall_f + join_wait_s, 1
        )
        out["F_join_wait_after_loop_s"] = round(join_wait_s, 1)
        out["F_snapshot_skipped"] = snap.skipped


def _tx(cfg):
    import optax

    from tvqvae_tpu.utils import warmup_cosine_schedule

    return optax.adamw(warmup_cosine_schedule(1e-3, 50000),
                       weight_decay=0.01)


if __name__ == "__main__":
    main()
