"""Benchmark: stage-1 training + generation throughput on the published
config (BASELINE.json north-star: "Gen trajectories/sec/chip; stage-1
steps/sec").

Runs on the real TPU chip (default env platform). Shapes are the published
EHAM->LIMC workload: 4 channels, L=4633, hid_dim 128, LF/HF codebooks 32,
prior transformers 4/1 layers, T=10/1 decode steps (BASELINE.md). Prints ONE
JSON line (driver contract); detail lives in "extra".

Baseline normalization (vs_baseline): the reference publishes no wall-clock
numbers (BASELINE.md "Throughput: not published"). The measured anchor is the
reference's own stage-1 training step run on this host's CPU via
tools/measure_reference.py: 0.0254 steps/s (torch 2.13 CPU, 1 thread,
B=32/C=4/L=4633 — 39.4 s/step). Its intended hardware is one unspecified GPU
(reference scripts/train.py:38); we normalize against an ESTIMATED reference
GPU rate of 10 steps/s (~400x its measured 1-core CPU rate — about right for
this BANDWIDTH-bound model on a data-center GPU; see PERF.md "Baseline
normalization"). extra.vs_reference_cpu_measured is the fully measured
(same-host CPU anchor) ratio; extra.mfu_* and extra.roofline ground the
absolute number against the chip's peak and HBM bandwidth. NOTE: every
timed chunk ends with an un-fakeable device->host value fetch — this
backend's block_until_ready can signal completion before execution
(PERF.md "MEASUREMENT CORRECTION").

Compute dtype: the driver line measures the bfloat16 conv-stack path
(params/BN stats/VQ/losses fp32) — the recommended production mode, quality-
validated end-to-end by tools/quality_run.py --bf16 (FID ladder floor 0.0006
-> rec 0.0014 -> gen 0.0055 << noise 0.82 on the structured-synthetic check,
same order as the fp32 run; see PERF.md). `--fp32` measures full-fp32.

Modes:
  python bench.py                 # driver mode: one JSON line (bf16)
  python bench.py --fp32          # full-fp32 measurement
  python bench.py --vq-sweep      # XLA vs Pallas VQ kernel sweep (table)
  python bench.py --train-loop    # host-inclusive runner window
  python bench.py --stage2        # stage-2 prior training step
  python bench.py --stage3        # stage-3 fidelity-enhancer training step
  python bench.py --batch-sweep   # larger-batch capability sweep
  python bench.py --distances     # flyability distance-scoring throughput
"""

import argparse
import json
import time

import numpy as np

BASELINE_STAGE1_STEPS_PER_SEC = 10.0  # estimated reference single-GPU rate
REFERENCE_CPU_STEPS_PER_SEC = 0.0254  # measured: tools/measure_reference.py

# bf16 peak FLOP/s per chip by device kind (MFU denominator)
_PEAK_FLOPS = {
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,  # v6e
}


_LAST_GOOD_CACHE = "/tmp/bench_last_good.json"
# /tmp does not survive VM restarts (observed 2026-08-19: a restart wiped
# the round-4a cache mid-round) and the workspace gets re-cloned between
# sessions (observed 2026-08-20, dropping gitignored files). Three tiers:
#   - /tmp cache + an UNTRACKED repo-local replica: written by every
#     successful production run (live, newest)
#   - a TRACKED snapshot, committed deliberately (survives re-clones
#     without leaving the tree perpetually dirty — ADVICE r4 #2)
# The stale fallback loads ALL candidates and uses the newest measured_at
# (ADVICE r4 #3: a stale /tmp line must not shadow a newer committed one).
_here = __import__("os").path.dirname(__import__("os").path.abspath(__file__))
_LAST_GOOD_LOCAL = __import__("os").path.join(
    _here, ".bench_last_good.local.json"
)
_LAST_GOOD_REPO = __import__("os").path.join(_here, ".bench_last_good.json")


def _emit_stale_and_exit(reason: str) -> None:
    """Driver-mode fallback when the TPU service is unreachable (observed
    outages exceed 11 h, 2026-08-17/18): emit the most recent MEASURED
    driver line, clearly marked stale, instead of hanging until the driver
    gives up with no record at all. Sources, in order: the cache written by
    the last successful run on this host, then the round-2 driver artifact."""
    import os

    row = None
    src = None
    best_t = ""
    for cand in (_LAST_GOOD_CACHE, _LAST_GOOD_LOCAL, _LAST_GOOD_REPO,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BENCH_r02.json")):
        try:
            with open(cand) as f:
                obj = json.load(f)
            # driver artifacts wrap the line under "parsed"
            r = obj.get("parsed", obj)
            if "metric" not in r:
                continue
            t = r.get("measured_at", "")
            # newest measured_at wins; unstamped sources (driver artifacts)
            # only serve when nothing stamped exists
            if row is None or t > best_t:
                row, src, best_t = r, cand, t
        except Exception:
            continue
    if row is None:
        row = {"metric": "stage1_train_steps_per_sec", "value": 0.0,
               "unit": "steps/s", "vs_baseline": 0.0, "extra": {}}
        src = "none"
    extra = dict(row.get("extra") or {})
    extra["stale"] = True
    extra["stale_reason"] = reason
    extra["stale_source"] = src
    row = {**row, "extra": extra}
    print(json.dumps(row), flush=True)
    os._exit(3)  # the hung backend init cannot be cancelled cooperatively


_RUN_DONE = None  # set by _arm_run_deadline; signalled before the real print


def _arm_run_deadline(deadline_s: float) -> None:
    """WHOLE-RUN watchdog (VERDICT r3 next-1a): from this call until the
    real driver line is printed, if deadline_s elapses the stale-marked
    last-good line is emitted from the watchdog thread and the process
    exits — no matter WHERE the hang is (backend init, claim wedge,
    remote compile, execute, or the final fetch). Round 3's guard wrapped
    only backend init; the hang came after init succeeded and the driver
    killed the run with no JSON at all (BENCH_r03.json rc=124)."""
    global _RUN_DONE
    import threading

    _RUN_DONE = threading.Event()
    done = _RUN_DONE

    def watchdog():
        if not done.wait(deadline_s):
            _emit_stale_and_exit(
                f"bench did not reach its driver line within "
                f"{deadline_s:.0f}s of start (TPU service outage pattern: "
                f"hang can occur at init, compile, execute, or fetch)"
            )

    t = threading.Thread(target=watchdog, daemon=True)
    t.start()


def _driver_mode_guard(timeout_s: float) -> None:
    """First device contact with its own (shorter) watchdog: if the backend
    neither initializes nor fails within timeout_s, emit the stale fallback
    line immediately instead of waiting out the whole-run deadline."""
    import threading

    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            _emit_stale_and_exit(
                f"TPU backend init neither succeeded nor failed within "
                f"{timeout_s:.0f}s (service outage pattern)"
            )

    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    try:
        import jax

        jax.devices()  # triggers backend init / blocks on claim or outage
    except Exception as e:
        _emit_stale_and_exit(f"TPU backend init failed: {e!r}")
    done.set()


def _save_last_good(row: dict) -> None:
    """Live replicas go to /tmp + the UNTRACKED local file; the tracked
    .bench_last_good.json is only updated by an explicit commit (see the
    tier comment above — keeps the tree clean after routine runs)."""
    stamped = {**row, "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S")}
    for path in (_LAST_GOOD_CACHE, _LAST_GOOD_LOCAL):
        try:
            with open(path, "w") as f:
                json.dump(stamped, f)
        except OSError:
            pass


def _peak_flops():
    import jax

    kind = jax.devices()[0].device_kind
    for k, v in _PEAK_FLOPS.items():
        if kind.startswith(k):
            return v, kind
    return None, kind


def _compiled_flops(lowered_compiled):
    """Best-effort FLOPs from XLA cost analysis (None if unavailable)."""
    try:
        ca = lowered_compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


# HBM bandwidth per chip by device kind (memory-roofline denominator)
_HBM_BW = {
    "TPU v5 lite": 819e9,  # v5e
    "TPU v5e": 819e9,
    "TPU v5p": 2765e9,
    "TPU v4": 1228e9,
    "TPU v6 lite": 1640e9,  # v6e
}


def _cost_analysis(lowered_compiled):
    """(flops, bytes_accessed) from XLA cost analysis (Nones if absent)."""
    try:
        ca = lowered_compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"]), float(ca.get("bytes accessed", 0)) or None
    except Exception:
        return None, None


def _roofline(flops, nbytes, steps_per_sec, device_kind):
    """Compute/memory floors vs measured step time.

    The stage-1 step is MEMORY-bound: the HLO "bytes accessed" estimate
    (31.4 GB) divided by HBM bandwidth lands within ~1.5x of the
    drain-verified measured step (55 ms), while the compute floor is 5.1 ms
    (MFU ~9%). Earlier notes here claimed the step "beats the memory floor
    4x" — that was an artifact of this backend's broken completion
    signaling (see _chunk_rates); drain-verified timing corrected it.
    """
    peak = bw = None
    for k, v in _PEAK_FLOPS.items():
        if device_kind.startswith(k):
            peak = v
    for k, v in _HBM_BW.items():
        if device_kind.startswith(k):
            bw = v
    if not (flops and peak and steps_per_sec):
        return None
    compute_ms = flops / peak * 1e3
    step_ms = 1e3 / steps_per_sec
    out = {
        "compute_floor_ms": round(compute_ms, 3),
        "measured_step_ms": round(step_ms, 3),
        "attained_of_compute_floor": round(compute_ms / step_ms, 3),
    }
    if nbytes and bw:
        out["hlo_bytes_accessed_gb"] = round(nbytes / 1e9, 2)
        out["memory_floor_ms_hlo_estimate"] = round(nbytes / bw * 1e3, 3)
    return out


def _chunk_rates(fn, n_chunks: int, chunk: int, unit_per_call: float = 1.0,
                 drain=None):
    """Run fn n_chunks*chunk times; return per-chunk rates (unit/s).

    `drain()` (if given) must FETCH a real value derived from the chunk's
    final state (e.g. float(jnp.sum(param_leaf))). On this environment's
    tunneled backend, block_until_ready's readiness signal can fire before
    the computation actually finishes (measured: apparent throughput up to
    5x the chip's peak FLOP rate — physically impossible), so every timed
    chunk must end with an un-fakeable device->host value transfer. The
    fetch itself adds one small-RPC round trip per chunk, amortized over
    the chunk length."""
    import jax

    rates = []
    for _ in range(n_chunks):
        t0 = time.perf_counter()
        out = None
        for _ in range(chunk):
            out = fn()
        if drain is not None:
            drain()
        else:
            jax.block_until_ready(out)
        rates.append(chunk * unit_per_call / (time.perf_counter() - t0))
    return np.asarray(rates)



def _state_drain(box):
    """Returns a drain() that fetches scalars DERIVED from box[0]'s params
    AND optimizer state (or the array itself) — forcing true completion of
    the queued chain including the optimizer-update side of the graph."""
    import jax
    import jax.numpy as jnp

    def drain():
        st = box[0]
        total = 0.0
        if hasattr(st, "params"):
            total += float(jnp.sum(jax.tree.leaves(st.params)[0]))
            if hasattr(st, "opt_state"):
                opt_leaves = [
                    l for l in jax.tree.leaves(st.opt_state)
                    if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
                ]
                if opt_leaves:
                    total += float(jnp.sum(opt_leaves[0]))
        else:
            total += float(jnp.sum(jax.tree.leaves(st)[0]))
        return total

    return drain

def setup_stage1(cfg, B, C, L, compute_dtype="float32", remat=False,
                 fast_bn=False, bf16_mu=False, bf16_nu=False,
                 bf16_head=False, use_pallas=False, bf16_istft=False):
    import jax
    import jax.numpy as jnp
    import optax

    from tvqvae_tpu.models import Stage1Spec, init_stage1
    from tvqvae_tpu.train import make_stage1_train_step
    from tvqvae_tpu.train.stage1 import create_stage1_state
    from tvqvae_tpu.utils import warmup_cosine_schedule

    spec = Stage1Spec.from_config(
        cfg, L, C, compute_dtype=compute_dtype, remat=remat, fast_bn=fast_bn,
        bf16_head=bf16_head, use_pallas=use_pallas, bf16_istft=bf16_istft,
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, C, L)), jnp.float32
    )
    model, params, batch_stats, vq_l, vq_h = init_stage1(
        jax.random.key(0), spec, x
    )
    # bf16_mu probes the optimizer-state HBM traffic (the top consumer in
    # the fast_bn roofline: 181.4M fp32 params x ~28 B/param AdamW): first
    # moment in bf16 halves the mu read+write (~0.73 GB of ~31 GB/step).
    from tvqvae_tpu.train.optim import adamw as adamw_storage
    tx = adamw_storage(warmup_cosine_schedule(1e-3, 50000), weight_decay=0.01,
                       mu_dtype=jnp.bfloat16 if bf16_mu else None,
                       nu_dtype=jnp.bfloat16 if bf16_nu else None)
    state = create_stage1_state(params, batch_stats, vq_l, vq_h, tx)
    step = jax.jit(make_stage1_train_step(model, tx), donate_argnums=0)
    return spec, model, step, state, x


def bench_stage1(cfg, B=32, C=4, L=4633, warmup=20, chunks=7, chunk=40,
                 compute_dtype="float32", bundle=1, remat=False,
                 fast_bn=False, bf16_mu=False, bf16_nu=False,
                 bf16_head=False, use_pallas=False, bf16_istft_train=False):
    """Measures the per-step-dispatch training loop; with bundle > 1 ALSO
    measures the bundled lax.scan loop (runner `bundle_steps`) and makes
    THAT the headline steps/s (it is the loop shape the runner and
    tools/full_run.py actually train with).

    The round-3 note that the scan body ran slower than sequential dispatch
    was an artifact of the val/snapshot dispatch thief + drain methodology;
    round-4 drain-verified probes measured the bundled scan at/above the
    sequential device rate (PERF.md probe E, full-geometry run #4), so the
    driver line now defaults to bundled stepping (VERDICT r4 next-2). All
    timed chunks end with an un-fakeable device->host value fetch either
    way."""
    import jax
    import jax.numpy as jnp

    from tvqvae_tpu.train.stage1 import make_stage1_train_multistep
    from tvqvae_tpu.train import make_stage1_train_step  # noqa: F401

    spec, model, step, state, x = setup_stage1(
        cfg, B, C, L, compute_dtype, remat=remat, fast_bn=fast_bn,
        bf16_mu=bf16_mu, bf16_nu=bf16_nu, bf16_head=bf16_head,
        use_pallas=use_pallas, bf16_istft=bf16_istft_train,
    )
    rng = jax.random.key(1)

    # FLOPs of the compiled step for MFU (before donation consumes buffers)
    flops, nbytes = _cost_analysis(step.lower(state, x, rng).compile())

    # fresh-buffer copy for bench_generation: the training loop below
    # donates its input state buffers every call
    state_for_gen = jax.tree.map(lambda a: a + 0 if hasattr(a, "dtype") else a,
                                 state)

    for _ in range(warmup):
        state, m = step(state, x, rng)
    box = [state]
    # end warmup with a REAL drain: block_until_ready lies on this backend,
    # so without this the first timed chunk absorbs the step compile + the
    # warmup backlog (observed: chunk-1 at 0.23 steps/s wrecking p10)
    _state_drain(box)()

    def one():
        box[0], mm = step(box[0], x, rng)
        return mm

    rates = _chunk_rates(one, chunks, chunk, drain=_state_drain(box))

    out = {
        "perstep_steps_per_sec_p50": float(np.percentile(rates, 50)),
        "perstep_steps_per_sec_p10": float(np.percentile(rates, 10)),
        "perstep_steps_per_sec_p90": float(np.percentile(rates, 90)),
        # raw per-chunk series: makes any p10/p50 spread attributable in
        # the artifact itself (tunnel weather vs a genuine slow mode)
        "chunk_rates": [round(float(r), 2) for r in rates],
    }

    if bundle > 1:
        from tvqvae_tpu.train.optim import adamw as adamw_storage
        from tvqvae_tpu.utils import warmup_cosine_schedule

        # the SAME optimizer-storage mode as the per-step path: the
        # bundled driver line must measure the production recipe
        # (bf16_mu default), not a silently-fp32 variant
        tx = adamw_storage(
            warmup_cosine_schedule(1e-3, 50000), weight_decay=0.01,
            mu_dtype=jnp.bfloat16 if bf16_mu else None,
            nu_dtype=jnp.bfloat16 if bf16_nu else None,
        )
        mstep = jax.jit(
            make_stage1_train_multistep(model, tx, bundle), donate_argnums=0
        )
        xs = jnp.asarray(
            np.random.default_rng(2).normal(size=(bundle, B, C, L)),
            jnp.float32,
        )
        for _ in range(max(warmup // bundle, 3)):
            box[0], m = mstep(box[0], xs, rng)
        _state_drain(box)()  # true warmup completion (see per-step note)

        def one_bundle():
            box[0], mm = mstep(box[0], xs, rng)
            return mm

        brates = _chunk_rates(
            one_bundle, chunks, max(chunk // bundle, 3),
            unit_per_call=bundle, drain=_state_drain(box),
        )
        out["bundle_steps"] = bundle
        out["steps_per_sec_p50"] = float(np.percentile(brates, 50))
        out["steps_per_sec_p10"] = float(np.percentile(brates, 10))
        out["steps_per_sec_p90"] = float(np.percentile(brates, 90))
    else:
        out["bundle_steps"] = 1
        out["steps_per_sec_p50"] = out["perstep_steps_per_sec_p50"]
        out["steps_per_sec_p10"] = out["perstep_steps_per_sec_p10"]
        out["steps_per_sec_p90"] = out["perstep_steps_per_sec_p90"]

    peak, kind = _peak_flops()
    out["device_kind"] = kind
    if flops is not None:
        out["flops_per_step"] = flops
        if peak:
            out["mfu_vs_bf16_peak"] = float(
                flops * out["steps_per_sec_p50"] / peak
            )
        rl = _roofline(flops, nbytes, out["steps_per_sec_p50"], kind)
        if rl:
            out["roofline"] = rl
    return out, spec, state_for_gen


def bench_generation(cfg, spec, state, GB=256, chunks=7, chunk=6,
                     bf16_istft=True):
    """Sampler production mode: under bf16 compute the decode side runs
    bf16_head (spec-inherited) AND bf16_istft (TrainedModelSampler's
    defaults; both decode-side flags quality-gated on the L=512 ladder —
    PERF.md round-5). No-ops under fp32."""
    import dataclasses

    import jax

    if bf16_istft:
        spec = dataclasses.replace(spec, bf16_istft=True)

    from tvqvae_tpu.models.maskgit import FrozenStage1, MaskGITSpec, build_transformers
    from tvqvae_tpu.models.stage1 import Stage1Model
    from tvqvae_tpu.train.stage2 import init_stage2, make_sampling_fn

    frozen = FrozenStage1(
        params=state.params, batch_stats=state.batch_stats,
        vq_l=state.vq_l, vq_h=state.vq_h,
    )
    mg = MaskGITSpec.from_config(cfg, spec)
    t_l, t_h = build_transformers(cfg, spec, n_classes=5)
    p2, h_stats = init_stage2(jax.random.key(2), t_l, t_h, mg)
    sample_fn = make_sampling_fn(Stage1Model(spec), t_l, t_h, mg)

    import jax.numpy as jnp

    i_box = [0]
    out_box = [None]

    def one():
        i_box[0] += 1
        out_box[0] = sample_fn(
            frozen, p2, h_stats,
            jax.random.fold_in(jax.random.key(4), i_box[0]), GB, None,
        )
        return out_box[0]

    def drain():
        # un-fakeable device->host value fetch (see _chunk_rates docstring)
        return float(jnp.sum(jax.tree.leaves(out_box[0])[0][:2]))

    one()
    drain()  # true compile+warmup completion (block_until_ready lies here)
    rates = _chunk_rates(one, chunks, chunk, unit_per_call=GB, drain=drain)
    return {
        "traj_per_sec_p50": float(np.percentile(rates, 50)),
        "traj_per_sec_p10": float(np.percentile(rates, 10)),
        "traj_per_sec_p90": float(np.percentile(rates, 90)),
        "chunk_rates": [round(float(r), 1) for r in rates],
        "gen_batch": GB,
        "decode_steps": {"lf": mg.T_l, "hf": mg.T_h},
    }


def bench_batch_sweep(cfg, C=4, L=4633, compute_dtype="bfloat16"):
    """Capability sweep: stage-1 training samples/s and generation traj/s at
    batch sizes beyond the published config (B=32 / GB=256). Larger batches
    fill the MXU better; production deployments are free to use them."""
    import jax

    rows = []
    for B in (32, 128, 256):
        # each batch size isolated: a compile failure (the fp32 B=256
        # compile once OOM-killed the remote compile helper, PERF.md)
        # yields an error row instead of killing the whole sweep
        try:
            spec, model, step, state, x = setup_stage1(
                cfg, B, C, L, compute_dtype
            )
            rng = jax.random.key(1)
            flops, _ = _cost_analysis(step.lower(state, x, rng).compile())
            box = [state]
            for _ in range(10):
                box[0], m = step(box[0], x, rng)
            _state_drain(box)()  # true warmup completion

            def one():
                box[0], mm = step(box[0], x, rng)
                return mm

            rates = _chunk_rates(one, 5, 20, drain=_state_drain(box))
            sps = float(np.percentile(rates, 50))
            peak, kind = _peak_flops()
            row = {
                "mode": "stage1_train", "batch": B,
                "steps_per_sec_p50": round(sps, 2),
                "samples_per_sec_p50": round(sps * B, 1),
                "compute_dtype": compute_dtype,
            }
            if flops and peak:
                row["mfu_vs_bf16_peak"] = round(flops * sps / peak, 4)
            del state, box, step
        except Exception as e:  # noqa: BLE001 — keep sweeping
            row = {
                "mode": "stage1_train", "batch": B,
                "compute_dtype": compute_dtype,
                "error": f"{type(e).__name__}: {e}"[:300],
            }
        rows.append(row)
        import gc

        gc.collect()

    spec, model, step, state, x = setup_stage1(cfg, 32, C, L, compute_dtype)
    for GB in (256, 1024):
        g = bench_generation(cfg, spec, state, GB=GB, chunks=5, chunk=4)
        rows.append({
            "mode": "generation", "batch": GB,
            "traj_per_sec_p50": round(g["traj_per_sec_p50"], 1),
        })
    return rows


def bench_distances(L=4633, n_pairs=16):
    """Flyability distance scoring (SURVEY.md hot loop #5): all 14 metrics
    for n_pairs flight pairs at full trajectory length, via the bucketed
    vmapped kernels the evaluate_flyability CLI uses. The reference's
    vendored pure-Python DPs take ~minutes per PAIR at L=4633."""
    from tvqvae_tpu.evaluation.flyability.distances import (
        calculate_trajectory_distances_batch,
    )

    rng = np.random.default_rng(0)
    base = np.array([48.0, 6.0])
    gens = [
        (base + np.cumsum(rng.normal(0, 0.01, (L, 2)), axis=0)).astype(
            np.float32
        )
        for _ in range(n_pairs)
    ]
    sims = [g + rng.normal(0, 0.003, g.shape).astype(np.float32)
            for g in gens]
    t0 = time.perf_counter()
    out = calculate_trajectory_distances_batch(gens, sims, (48.0, 6.0))
    compile_and_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = calculate_trajectory_distances_batch(gens, sims, (48.0, 6.0))
    warm = time.perf_counter() - t0
    return {
        "mode": "flyability_distances", "L": L, "n_pairs": n_pairs,
        "warm_sec_total": round(warm, 2),
        "pairs_per_sec_all14": round(n_pairs / warm, 2),
        "first_call_sec_incl_compile": round(compile_and_run, 1),
        "sample": {k: round(float(v[0]), 4) for k, v in out.items()},
    }


def bench_train_loop(cfg, B=32, C=4, L=4633, n_data=1024, steps=120):
    """Host-inclusive window: the real runner loop (batching + prefetch +
    logging cadence), not just the device step (VERDICT r1 weak #7)."""
    import jax
    import jax.numpy as jnp

    from tvqvae_tpu.data.dataset import make_batches
    from tvqvae_tpu.parallel import make_mesh, prefetch_batches, replicate_tree
    from tvqvae_tpu.utils.profiling import StepTimer

    spec, model, step, state, x = setup_stage1(cfg, B, C, L)
    mesh = make_mesh()
    state = replicate_tree(mesh, state)
    X = np.random.default_rng(1).normal(size=(n_data, C, L)).astype(np.float32)
    rng = jax.random.key(1)
    batches = prefetch_batches(
        make_batches(X, None, B, shuffle=True, seed=0, repeat=True), mesh
    )
    # compile + warm
    for _ in range(5):
        xb, _ = next(batches)
        state, m = step(state, xb, rng)
    float(jnp.sum(jax.tree.leaves(state.params)[0]))  # true warmup completion
    timer = StepTimer()
    t0 = time.perf_counter()
    for _ in range(steps):
        xb, _ = next(batches)
        state, m = step(state, xb, rng)
        timer.tick()
    float(jnp.sum(jax.tree.leaves(state.params)[0]))  # un-fakeable drain
    dt = time.perf_counter() - t0
    return {
        "train_loop_steps_per_sec": steps / dt,
        "train_loop_steps": steps,
        **{f"train_loop_{k}": v for k, v in timer.summary().items()},
    }


def bench_stage2(cfg, B=16, C=4, L=4633, warmup=10, chunks=5, chunk=10):
    """Stage-2 (MaskGIT prior) training step at the published config
    (batch_sizes.stage2=16): frozen stage-1 encode -> random masking -> both
    prior transformers -> masked CE -> AdamW."""
    import jax
    import optax

    from tvqvae_tpu.models.maskgit import FrozenStage1, MaskGITSpec, build_transformers
    from tvqvae_tpu.train.stage2 import (
        create_stage2_state,
        init_stage2,
        make_stage2_train_step,
    )
    from tvqvae_tpu.utils import warmup_cosine_schedule

    spec, model, _, s1_state, _ = setup_stage1(cfg, B, C, L)
    frozen = FrozenStage1(
        params=s1_state.params, batch_stats=s1_state.batch_stats,
        vq_l=s1_state.vq_l, vq_h=s1_state.vq_h,
    )
    mg = MaskGITSpec.from_config(cfg, spec)
    t_l, t_h = build_transformers(cfg, spec, n_classes=5)
    p2, h_stats = init_stage2(jax.random.key(2), t_l, t_h, mg)
    tx = optax.adamw(warmup_cosine_schedule(1e-3, 200000), weight_decay=0.01)
    state = create_stage2_state(p2, h_stats, tx)
    step = jax.jit(make_stage2_train_step(model, t_l, t_h, mg, tx),
                   donate_argnums=0)

    import jax.numpy as jnp
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, C, L)), jnp.float32)
    y = jnp.zeros((B, 1), jnp.int32)
    rng = jax.random.key(1)
    flops = _compiled_flops(step.lower(state, frozen, x, y, rng).compile())

    for _ in range(warmup):
        state, m = step(state, frozen, x, y, rng)
    box = [state]
    _state_drain(box)()  # true warmup completion (see bench_stage1 note)

    def one():
        box[0], mm = step(box[0], frozen, x, y, rng)
        return mm

    rates = _chunk_rates(one, chunks, chunk, drain=_state_drain(box))
    out = {
        "stage2_steps_per_sec_p50": float(np.percentile(rates, 50)),
        "stage2_steps_per_sec_p10": float(np.percentile(rates, 10)),
        "stage2_steps_per_sec_p90": float(np.percentile(rates, 90)),
        "batch": B,
    }
    peak, kind = _peak_flops()
    if flops is not None:
        out["flops_per_step"] = flops
        if peak:
            out["mfu_vs_bf16_peak"] = float(
                flops * out["stage2_steps_per_sec_p50"] / peak
            )
    return out


def bench_stage3(cfg, B=16, C=4, L=4633, warmup=10, chunks=5, chunk=10,
                 compute_dtype="float32", fast_norm=False):
    """Stage-3 (fidelity enhancer) training step at the published config
    (batch_sizes.stage3=16): frozen SVQ roundtrip -> U-Net FE -> L1 -> AdamW."""
    import jax
    import jax.numpy as jnp
    import optax

    from tvqvae_tpu.models.fidelity_enhancer import FidelityEnhancer
    from tvqvae_tpu.models.maskgit import FrozenStage1
    from tvqvae_tpu.train.stage3 import (
        create_stage3_state,
        init_stage3,
        make_stage3_train_step,
    )
    from tvqvae_tpu.utils import warmup_cosine_schedule

    spec, model, _, s1_state, _ = setup_stage1(cfg, B, C, L)
    frozen = FrozenStage1(
        params=s1_state.params, batch_stats=s1_state.batch_stats,
        vq_l=s1_state.vq_l, vq_h=s1_state.vq_h,
    )
    fe = FidelityEnhancer(
        input_length=L, in_channels=C, dim=cfg.fidelity_enhancer.dim,
        dim_mults=tuple(cfg.fidelity_enhancer.dim_mults),
        resnet_block_groups=cfg.fidelity_enhancer.resnet_block_groups,
        dropout=cfg.fidelity_enhancer.dropout,
        compute_dtype=compute_dtype,
        fast_norm=fast_norm,
    )
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, C, L)), jnp.float32)
    params = init_stage3(jax.random.key(3), fe, x)
    tx = optax.adamw(warmup_cosine_schedule(1e-3, 50000), weight_decay=0.01)
    state = create_stage3_state(params, tx)
    step = jax.jit(make_stage3_train_step(model, fe, tx), donate_argnums=0)
    rng = jax.random.key(1)
    flops = _compiled_flops(step.lower(state, frozen, x, rng).compile())

    for _ in range(warmup):
        state, m = step(state, frozen, x, rng)
    box = [state]
    _state_drain(box)()  # true warmup completion (see bench_stage1 note)

    def one():
        box[0], mm = step(box[0], frozen, x, rng)
        return mm

    rates = _chunk_rates(one, chunks, chunk, drain=_state_drain(box))
    out = {
        "stage3_steps_per_sec_p50": float(np.percentile(rates, 50)),
        "stage3_steps_per_sec_p10": float(np.percentile(rates, 10)),
        "stage3_steps_per_sec_p90": float(np.percentile(rates, 90)),
        "batch": B,
    }
    peak, kind = _peak_flops()
    if flops is not None:
        out["flops_per_step"] = flops
        if peak:
            out["mfu_vs_bf16_peak"] = float(
                flops * out["stage3_steps_per_sec_p50"] / peak
            )
    return out


def bench_vq_sweep(sizes=(32, 128, 512, 2048), D=128, M=3456, iters=1000):
    """XLA vs Pallas fused VQ assignment/stats at the published latent dim
    (M defaults to B=32 x HF tokens 108; VERDICT r1 weak #6)."""
    import jax
    import jax.numpy as jnp

    from tvqvae_tpu.models.vq import CodebookState, VQParams, vq_forward

    rows = []
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, M, D)), jnp.float32
    )
    for K in sizes:
        embed = jax.random.normal(jax.random.key(K), (K, D), jnp.float32)
        st = CodebookState(
            embed=embed, embed_avg=embed + 0.0,
            cluster_size=jnp.zeros((K,), jnp.float32),
            initted=jnp.asarray(True),
        )
        row = {"K": K, "M": M, "D": D}
        for use_pallas in (False, True):
            p = VQParams(codebook_size=K, dim=D, use_pallas=use_pallas)
            f = jax.jit(
                lambda s, v: vq_forward(s, v, p, train=True,
                                        rng=jax.random.key(0)).state
            )
            try:
                out = jax.block_until_ready(f(st, x))  # compile
                float(jnp.sum(out.cluster_size))
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = f(st, x)
                float(jnp.sum(out.cluster_size))  # un-fakeable drain
                us = (time.perf_counter() - t0) / iters * 1e6
                row["pallas_us" if use_pallas else "xla_us"] = round(us, 1)
            except Exception as e:  # pallas may be unsupported on host CPU
                row["pallas_us" if use_pallas else "xla_us"] = f"err: {e}"
        rows.append(row)
    return rows


def _multichip_devices(n: int):
    """n devices for --multichip: the REAL platform when it has >= n chips
    (probed in a SUBPROCESS with a seconds-scale timeout so a TPU-service
    outage can't wedge this process — VERDICT r3 weak #1 pattern), else a
    virtual CPU mesh (numbers marked cpu_mesh). Same bench code either way:
    the scaling table materializes the day real chips exist."""
    import os
    import subprocess
    import sys

    use_real = False
    if os.environ.get("MULTICHIP_FORCE_CPU") != "1":
        try:
            out = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d=jax.devices(); "
                 "print(len(d), d[0].platform)"],
                capture_output=True, text=True, timeout=90,
            )
            if out.returncode == 0:
                cnt, plat = out.stdout.split()[-2:]
                use_real = int(cnt) >= n and plat != "cpu"
        except Exception:
            use_real = False

    import jax

    if use_real:
        return jax.devices()[:n], False

    import jax.extend.backend as jeb

    try:
        jeb.clear_backends()
    except Exception:
        pass
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_num_cpu_devices", max(n, 2))
    jax.config.update("jax_platforms", "cpu")
    return jax.devices()[:n], True


def bench_multichip(n: int):
    """Multi-chip scaling bench (VERDICT r3 next-5): stage-1 data-parallel
    training step + generation fan-out over an n-device mesh, vs the same
    per-device workload on a 1-device mesh. Reports per-device and
    aggregate rates plus the collective's share of step time (the weak-
    scaling overhead: gradient + VQ-EMA psum along `data`). On the virtual
    CPU mesh (cpu_mesh=true) the numbers validate plumbing, not ICI; the
    identical program fires on real chips unchanged."""
    import jax

    from tvqvae_tpu.config import Config
    from tvqvae_tpu.parallel import make_mesh, replicate_tree, shard_batch

    devices, cpu_mesh = _multichip_devices(n)
    cfg = Config()
    # CPU-mesh runs use a reduced geometry (1 host core): plumbing +
    # scaling-shape validation. Real chips get the published geometry.
    if cpu_mesh:
        B_dev, C, L, dtype = 4, 4, 512, "float32"
        chunks, chunk, warmup = 3, 4, 2
    else:
        B_dev, C, L, dtype = 32, 4, 4633, "bfloat16"
        chunks, chunk, warmup = 5, 20, 10

    import jax.numpy as jnp

    rows = []

    def _rate(mesh, B_total, label):
        spec, model, step, state, _ = setup_stage1(
            cfg, B_total, C, L, compute_dtype=dtype, fast_bn=True
        )
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(B_total, C, L)),
            jnp.float32,
        )
        state = replicate_tree(mesh, state)
        xb = shard_batch(mesh, x)
        rng = jax.random.key(1)
        box = [state]
        for _ in range(warmup):
            box[0], m = step(box[0], xb, rng)
        _state_drain(box)()

        def one():
            box[0], mm = step(box[0], xb, rng)
            return mm

        rates = _chunk_rates(one, chunks, chunk, drain=_state_drain(box))
        del box
        return float(np.percentile(rates, 50))

    mesh_n = make_mesh(n, devices)
    mesh_1 = make_mesh(1, devices[:1])
    sps_1 = _rate(mesh_1, B_dev, "1dev")
    sps_n = _rate(mesh_n, B_dev * n, f"{n}dev")
    eff = sps_n / sps_1 if sps_1 else None
    row = {
        "mode": "multichip_stage1_dp", "n_devices": n, "cpu_mesh": cpu_mesh,
        "geometry": {"B_per_device": B_dev, "C": C, "L": L, "dtype": dtype},
        "steps_per_sec_1dev": round(sps_1, 3),
        "steps_per_sec_ndev": round(sps_n, 3),
        "agg_samples_per_sec": round(sps_n * B_dev * n, 1),
        "weak_scaling_efficiency": round(eff, 3) if eff else None,
    }
    if cpu_mesh:
        # n virtual devices TIMESHARE the host cores: the per-step work is
        # n x the 1-dev step, so the efficiency ceiling is cores/n, not 1.
        # Efficiency relative to that ceiling isolates the SPMD overhead
        # (collectives + partitioning) from plain core oversubscription.
        import os as _os

        cores = _os.cpu_count() or 1
        ceiling = min(1.0, cores / n)
        row["host_cores"] = cores
        row["timeshare_ceiling"] = round(ceiling, 3)
        if eff:
            row["efficiency_vs_timeshare_ceiling"] = round(eff / ceiling, 3)
        row["note"] = ("virtual CPU mesh: validates SPMD plumbing/scaling "
                       "shape only; ICI collective cost is NOT modeled")
    else:
        row["collective_share_of_step"] = (
            round(max(0.0, 1.0 - eff), 3) if eff else None
        )
        row["note"] = "real devices over ICI"
    rows.append(row)

    # tensor-parallel arm (n >= 4): same global batch on a 2-D
    # (data=n/2, model=2) mesh, big weights + AdamW moments sharded over
    # `model` (parallel/tp.py — the train --tp N path). The DP-vs-TP rate
    # ratio is the TP collective cost at this geometry; on the CPU mesh it
    # validates the 2-D plumbing only.
    if n >= 4:
        from tvqvae_tpu.parallel.tp import (
            make_mesh2d,
            shard_batch2d,
            shard_train_state_tp,
            sharded_fraction,
        )

        def _rate_tp(mesh2d, B_total):
            spec, model, step, state, _ = setup_stage1(
                cfg, B_total, C, L, compute_dtype=dtype, fast_bn=True
            )
            x = jnp.asarray(
                np.random.default_rng(0).normal(size=(B_total, C, L)),
                jnp.float32,
            )
            # CPU-mesh geometry sits below the production size floor;
            # use a floor that engages the rule either way
            state = shard_train_state_tp(
                mesh2d, state, min_elems=512 if cpu_mesh else None
            )
            frac = sharded_fraction(state.params)
            xb = shard_batch2d(mesh2d, x)
            rng = jax.random.key(1)
            box = [state]
            for _ in range(warmup):
                box[0], m = step(box[0], xb, rng)
            _state_drain(box)()

            def one():
                box[0], mm = step(box[0], xb, rng)
                return mm

            rates = _chunk_rates(one, chunks, chunk, drain=_state_drain(box))
            del box
            return float(np.percentile(rates, 50)), frac

        mesh2d = make_mesh2d(n // 2, 2, devices)
        sps_tp, frac = _rate_tp(mesh2d, B_dev * (n // 2))
        rows.append({
            "mode": "multichip_stage1_tp", "n_devices": n,
            "cpu_mesh": cpu_mesh,
            "mesh": {"data": n // 2, "model": 2},
            "geometry": {"B_per_data_shard": B_dev, "C": C, "L": L,
                         "dtype": dtype},
            "steps_per_sec": round(sps_tp, 3),
            "param_bytes_model_sharded": round(frac, 3),
            "steps_per_sec_dp_same_devices": round(sps_n, 3),
            "note": ("virtual CPU mesh: validates 2-D TP plumbing only"
                     if cpu_mesh else
                     "real devices: DP-vs-TP ratio = TP collective cost"),
        })

    # generation fan-out: sample batch sharded along `data`
    from tvqvae_tpu.models.maskgit import (
        FrozenStage1,
        MaskGITSpec,
        build_transformers,
    )
    from tvqvae_tpu.models.stage1 import Stage1Model
    from tvqvae_tpu.train.stage2 import init_stage2, make_sampling_fn

    spec, model, _, s1_state, _ = setup_stage1(
        cfg, B_dev, C, L, compute_dtype=dtype, fast_bn=True
    )
    import dataclasses as _dc

    spec = _dc.replace(spec, bf16_istft=True)  # sampler production mode
    frozen = replicate_tree(mesh_n, FrozenStage1(
        params=s1_state.params, batch_stats=s1_state.batch_stats,
        vq_l=s1_state.vq_l, vq_h=s1_state.vq_h,
    ))
    mg = MaskGITSpec.from_config(cfg, spec)
    t_l, t_h = build_transformers(cfg, spec, n_classes=5)
    p2, h_stats = init_stage2(jax.random.key(2), t_l, t_h, mg)
    p2 = replicate_tree(mesh_n, p2)
    h_stats = replicate_tree(mesh_n, h_stats)
    sample_fn = make_sampling_fn(Stage1Model(spec), t_l, t_h, mg, mesh=mesh_n)
    GB = (32 if cpu_mesh else 256) * n
    out_box = [None]

    def one_gen():
        out_box[0] = sample_fn(
            frozen, p2, h_stats, jax.random.key(4), GB, None
        )
        return out_box[0]

    def drain_gen():
        return float(jnp.sum(jax.tree.leaves(out_box[0])[0][:2]))

    one_gen()
    drain_gen()
    grates = _chunk_rates(one_gen, max(chunks - 2, 2), 2,
                          unit_per_call=GB, drain=drain_gen)
    rows.append({
        "mode": "multichip_generation", "n_devices": n, "cpu_mesh": cpu_mesh,
        "gen_batch_global": GB,
        "traj_per_sec_agg": round(float(np.percentile(grates, 50)), 1),
        "traj_per_sec_per_device": round(
            float(np.percentile(grates, 50)) / n, 1
        ),
    })
    return rows


def _enable_compilation_cache():
    """Persistent XLA compilation cache: the big stage-1/generation programs
    take minutes to (remote-)compile on this backend; cache hits make
    repeat bench runs start in seconds. Keyed by HLO hash, so code changes
    invalidate safely.

    Default location is /tmp (NOT the repo's .cache/jax): the workspace
    gets re-cloned between sessions (observed 2026-08-20), which wiped the
    repo-local cache and pushed the cold-clone driver run to 1256 s of its
    1650 s watchdog budget (VERDICT r4 weak-4 / next-7). /tmp survives a
    re-clone; nothing survives a VM restart either way."""
    import os

    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/tvqvae_jax_cache"
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization only


def main():
    _enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--vq-sweep", action="store_true")
    ap.add_argument("--train-loop", action="store_true")
    ap.add_argument("--stage2", action="store_true",
                    help="measure the stage-2 prior training step")
    ap.add_argument("--stage3", action="store_true",
                    help="measure the stage-3 fidelity-enhancer training step")
    ap.add_argument("--batch-sweep", action="store_true",
                    help="capability sweep: larger train/gen batches")
    ap.add_argument("--distances", action="store_true",
                    help="flyability 14-metric scoring throughput at L=4633")
    ap.add_argument("--bundle", type=int, default=10,
                    help="steps per dispatch for the bundled lax.scan loop "
                         "— the headline steps/s (the loop shape the runner "
                         "trains with; 10 matches tools/full_run.py). "
                         "--bundle 1 restores pure per-step dispatch")
    ap.add_argument("--fp32", action="store_true",
                    help="full-fp32 conv stacks (default is bfloat16 "
                         "compute, the quality-validated production mode)")
    ap.add_argument("--remat", action="store_true",
                    help="checkpoint the stage-1 conv blocks (recompute in "
                         "backward) — probes the activation-traffic lever "
                         "on the memory-bound step (PERF.md roofline)")
    ap.add_argument("--fast_bn", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="BatchNorm normalization arithmetic in the compute "
                         "dtype with fp32-accumulated stats (removes the "
                         "fp32 activation materialization around every BN "
                         "under bf16; tests/test_fast_bn.py). Default ON "
                         "since round 3: chip-measured 18.00 vs 17.65 "
                         "steps/s in adjacent windows and the L=512 quality "
                         "ladder holds (PERF.md); --no-fast_bn opts out")
    ap.add_argument("--bf16_mu", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="AdamW first moment in bf16 (optax mu_dtype) — "
                         "targets the optimizer-state HBM traffic, the top "
                         "consumer in the fast_bn roofline (PERF.md "
                         "'Roofline gap: bounded'). Default ON since round "
                         "4: +2.4%% steps/s and the L=512 quality gate "
                         "PASSED; --no-bf16_mu restores fp32 state")
    ap.add_argument("--bf16_nu", action="store_true",
                    help="store the AdamW second moment in bfloat16 "
                         "(train.optim.adamw nu_dtype) — symmetric lever "
                         "to --bf16_mu on the optimizer-state HBM traffic")
    ap.add_argument("--bf16_head", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="TimeHead (L, L) dense matmul in the compute "
                         "dtype (params/residual fp32) — the round-5 "
                         "per-fusion roofline lever. Default ON: +1.2%% "
                         "bundled steps/s, +4.4%% generation, and the "
                         "seed-varied L=512 gate PASSED (worst gen FID "
                         "0.01026 inside the 0.0042-0.01172 mu-only "
                         "spread; PERF.md round-5). --no-bf16_head "
                         "restores the fp32 head")
    ap.add_argument("--use_pallas", action="store_true",
                    help="fused Pallas VQ kernel inside the production "
                         "stage-1 step (the in-situ arm of the --vq-sweep "
                         "micro-benchmark; VERDICT r4 next-5)")
    ap.add_argument("--bf16_istft_train", action="store_true",
                    help="bf16 overlap-add in the TRAINING step too (the "
                         "loss-path arm of the bf16_istft lever; the "
                         "decode/sampler side is already the bf16 "
                         "default) — measurement arm, quality gate "
                         "required before any default flip")
    ap.add_argument("--tpu-wait", type=float,
                    default=float(__import__("os").environ.get(
                        "BENCH_TPU_WAIT", 900.0)),
                    help="driver mode: seconds to wait for TPU backend init "
                         "before emitting the stale-fallback line (claim "
                         "wedges clear in 10-20 min; outages hang 25+ min "
                         "then raise)")
    ap.add_argument("--deadline", type=float,
                    default=float(__import__("os").environ.get(
                        "BENCH_DEADLINE", 1650.0)),
                    help="driver mode: whole-run budget (start to JSON "
                         "line); on expiry the stale-marked last-good line "
                         "is emitted no matter where the hang is. Default "
                         "leaves 150 s of emit margin inside the driver's "
                         "~1800 s kill while clearing the measured 1256 s "
                         "cold-clone run (2026-08-20)")
    ap.add_argument("--multichip", type=int, default=0, metavar="N",
                    help="multi-chip scaling bench over an N-device mesh "
                         "(virtual CPU mesh when the platform is short — "
                         "numbers marked cpu_mesh; same code fires on real "
                         "ICI unchanged)")
    args = ap.parse_args()

    driver_mode = not any((args.vq_sweep, args.batch_sweep, args.distances,
                           args.train_loop, args.stage2, args.stage3,
                           args.multichip))
    if driver_mode:
        _arm_run_deadline(args.deadline)
        _driver_mode_guard(min(args.tpu_wait, args.deadline * 0.75))

    if args.multichip:
        for row in bench_multichip(args.multichip):
            print(json.dumps(row))
        return

    from tvqvae_tpu.config import Config

    cfg = Config()  # full published config

    if args.vq_sweep:
        for row in bench_vq_sweep():
            print(json.dumps(row))
        return
    if args.batch_sweep:
        sweep_dtype = "float32" if args.fp32 else "bfloat16"
        for row in bench_batch_sweep(cfg, compute_dtype=sweep_dtype):
            print(json.dumps(row))
        return
    if args.distances:
        print(json.dumps(bench_distances()))
        return
    if args.train_loop:
        print(json.dumps(bench_train_loop(cfg)))
        return
    if args.stage2:
        print(json.dumps(bench_stage2(cfg)))
        return
    if args.stage3:
        s3_dtype = "float32" if args.fp32 else "bfloat16"
        out3 = bench_stage3(cfg, compute_dtype=s3_dtype,
                            fast_norm=args.fast_bn)
        out3["compute_dtype"] = s3_dtype
        out3["fast_norm"] = args.fast_bn
        print(json.dumps(out3))
        return

    dtype = "float32" if args.fp32 else "bfloat16"
    s1, spec, state = bench_stage1(cfg, compute_dtype=dtype,
                                   bundle=args.bundle, remat=args.remat,
                                   fast_bn=args.fast_bn,
                                   bf16_mu=args.bf16_mu,
                                   bf16_nu=args.bf16_nu,
                                   bf16_head=args.bf16_head,
                                   use_pallas=args.use_pallas,
                                   bf16_istft_train=args.bf16_istft_train)
    gen = bench_generation(cfg, spec, state)

    sps = s1["steps_per_sec_p50"]
    extra = {
        "gen_trajectories_per_sec_per_chip": round(gen["traj_per_sec_p50"], 1),
        "gen_traj_per_sec_p10_p90": [
            round(gen["traj_per_sec_p10"], 1), round(gen["traj_per_sec_p90"], 1)
        ],
        "gen_chunk_rates": gen.get("chunk_rates"),
        "gen_batch": gen["gen_batch"],
        "decode_steps": gen["decode_steps"],
        "steps_per_sec_p10_p90": [
            round(s1["steps_per_sec_p10"], 3), round(s1["steps_per_sec_p90"], 3)
        ],
        "stage1_chunk_rates": s1.get("chunk_rates"),
        "bundle_steps": s1.get("bundle_steps", 1),
        "perstep_dispatch_steps_per_sec_p50": round(
            s1.get("perstep_steps_per_sec_p50", 0.0), 3
        ),
        "device_kind": s1["device_kind"],
        "roofline": s1.get("roofline"),
        "reference_cpu_steps_per_sec_measured": REFERENCE_CPU_STEPS_PER_SEC,
        "vs_reference_cpu_measured": round(
            sps / REFERENCE_CPU_STEPS_PER_SEC, 1
        ),
        "baseline_note": (
            "baseline=10 steps/s ESTIMATED reference single-GPU rate "
            "(~400x its MEASURED 0.0254 steps/s on this host's CPU; "
            "tools/measure_reference.py)"
        ),
        "full_geometry_run_measured": (
            "published budgets 50k/200k/50k at L=4633/hid-128 trained "
            "end-to-end on this chip in 70.1 min (74.2 incl. the "
            "1024-sample evaluation; round-4 run #5, tools/full_run.py: "
            "bundled scans at the device rate, precomputed frozen-stage "
            "paths, jitted cached inits, non-blocking snapshots); FID "
            "ladder at full geometry: floor 0.0002, rec 0.0003, gen "
            "0.0019, noise 0.94; IS 3.32 — see PERF.md"
        ),
    }
    if "mfu_vs_bf16_peak" in s1:
        extra["mfu_vs_bf16_peak"] = round(s1["mfu_vs_bf16_peak"], 4)
        extra["flops_per_step"] = s1["flops_per_step"]
    extra["compute_dtype"] = dtype
    if args.remat:
        extra["remat"] = True
    if args.fast_bn:
        extra["fast_bn"] = True
    if args.bf16_mu:
        extra["bf16_mu"] = True
    if args.bf16_nu:
        extra["bf16_nu"] = True
    if args.bf16_head:
        extra["bf16_head"] = True
    if args.use_pallas:
        extra["use_pallas"] = True
    if args.bf16_istft_train:
        extra["bf16_istft_train"] = True
    row = {
        "metric": "stage1_train_steps_per_sec",
        "value": round(sps, 3),
        "unit": (
            f"steps/s (B=32, C=4, L=4633, published config, {dtype} "
            "conv stacks, 1 chip, p50"
            + (f", bundled lax.scan loop {s1['bundle_steps']} steps/dispatch"
               if s1.get("bundle_steps", 1) > 1 else "")
            + "); vs_baseline denominator is an ESTIMATED 10 steps/s "
            "reference single-GPU rate"
        ),
        "vs_baseline": round(sps / BASELINE_STAGE1_STEPS_PER_SEC, 3),
        # measured anchors promoted to the top level (VERDICT r3 next-7):
        # the line must be readable without PERF.md context
        "vs_reference_cpu_measured": round(
            sps / REFERENCE_CPU_STEPS_PER_SEC, 1
        ),
        "extra": extra,
    }
    rl = s1.get("roofline") or {}
    if rl.get("memory_floor_ms_hlo_estimate"):
        row["pct_of_hbm_roofline"] = round(
            100.0 * rl["memory_floor_ms_hlo_estimate"]
            / rl["measured_step_ms"], 1
        )
    if not args.fp32 and not args.remat and args.fast_bn \
            and args.bf16_mu and not args.bf16_nu and args.bf16_head \
            and not args.use_pallas and not args.bf16_istft_train:
        # production-default run (fast_bn + bf16_mu since round 4, bundled
        # stepping since round 5): stale-fallback source for outage windows
        _save_last_good(row)
    if _RUN_DONE is not None:
        _RUN_DONE.set()  # disarm the whole-run watchdog: real line follows
    print(json.dumps(row))


if __name__ == "__main__":
    main()
