"""Training orchestration for all pipeline stages.

The TPU-native replacement for the reference's Lightning `Trainer.fit`
wiring (timevqvae/scripts/train.py:29-125): plain jitted SPMD loops with
periodic validation, JSONL/MLflow logging, and Orbax checkpoints. Stage
chaining goes through checkpoint files exactly like the reference CLI
surface (stage1.ckpt -> stage2.ckpt -> stage3.ckpt + fcn.ckpt), but each
checkpoint carries an explicit param tree + JSON meta instead of a pickled
LightningModule.
"""

import dataclasses
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tvqvae_tpu.config import Config
from tvqvae_tpu.data.dataset import DatasetSplits, make_batches
from tvqvae_tpu.models import FCN, Stage1Spec, init_stage1
from tvqvae_tpu.models.fidelity_enhancer import FidelityEnhancer
from tvqvae_tpu.models.maskgit import (
    FrozenStage1,
    MaskGITSpec,
    build_transformers,
)
from tvqvae_tpu.models.stage1 import Stage1Model
from tvqvae_tpu.models.vq import CodebookState
from tvqvae_tpu.parallel import make_mesh, prefetch_batches, replicate_tree, shard_batch
from tvqvae_tpu.train.stage1 import (
    create_stage1_state,
    make_stage1_eval_step,
    make_stage1_train_step,
)
from tvqvae_tpu.train.stage2 import (
    create_stage2_state,
    init_stage2,
    make_stage2_train_step,
)
from tvqvae_tpu.train.stage3 import (
    create_stage3_state,
    init_stage3,
    make_stage3_train_step,
)
from tvqvae_tpu.utils.checkpoint import (
    AsyncSnapshotter,
    load_checkpoint,
    save_checkpoint,
)
from tvqvae_tpu.utils.logging import RunLogger
from tvqvae_tpu.utils.schedule import warmup_cosine_schedule


# --------------------------------------------------------------------------
# mesh construction: 1-D data-parallel by default, optional 2-D
# (data, model) tensor-parallel axis (parallel/tp.py)


def _make_train_mesh(tp: int = 1):
    """1-D `data` mesh (default), or a 2-D (data, model) mesh when tp > 1.

    Every sharding helper the train loops use (data_sharding, shard_batch,
    bundle_sharding, replicate_tree) names only the `data` axis in its
    PartitionSpec, so the input path is mesh-rank-agnostic; only state
    placement differs (see _place_state)."""
    if tp <= 1:
        return make_mesh()
    from tvqvae_tpu.parallel.tp import make_mesh2d

    assert jax.process_count() == 1, (
        "tp > 1 is single-process for now: the multi-host input feed "
        "(make_process_global_batch) assembles shards over `data` only"
    )
    devs = jax.devices()
    assert len(devs) % tp == 0, (
        f"{len(devs)} devices not divisible by tp={tp}"
    )
    return make_mesh2d(len(devs) // tp, tp)


def _place_state(mesh, state, tp: int = 1):
    """Replicate (DP) or TP-shard (params + optimizer moments over
    `model`, rest replicated) a freshly built or snapshot-restored state."""
    if tp <= 1:
        return replicate_tree(mesh, state)
    from tvqvae_tpu.parallel.tp import shard_train_state_tp

    return shard_train_state_tp(mesh, state)


# --------------------------------------------------------------------------
# codebook (de)serialization


def codebook_to_dict(cb: CodebookState) -> dict:
    return {
        "embed": np.asarray(cb.embed),
        "embed_avg": np.asarray(cb.embed_avg),
        "cluster_size": np.asarray(cb.cluster_size),
        "initted": np.asarray(cb.initted),
    }


def codebook_from_dict(d: dict) -> CodebookState:
    return CodebookState(
        embed=jnp.asarray(d["embed"]),
        embed_avg=jnp.asarray(d["embed_avg"]),
        cluster_size=jnp.asarray(d["cluster_size"]),
        initted=jnp.asarray(d["initted"]),
    )


def config_meta(cfg: Config, data: DatasetSplits,
                completed_step: Optional[int] = None) -> dict:
    meta = {
        "config": dataclasses.asdict(cfg),
        "input_length": int(data.input_length),
        "in_channels": int(data.in_channels),
        "n_classes": int(data.n_classes),
    }
    if completed_step is not None:
        meta["completed_step"] = int(completed_step)
    return meta


def _stage_completed(save_path: str, max_steps: int, resume: bool,
                     name: str) -> bool:
    """Stage idempotency via the checkpoint meta: a finished stage records
    its completed step, so re-invoking the stage (chipqueue resume,
    `full_run --stages` re-runs) returns immediately instead of retraining
    from the last mid-run snapshot. This replaces the forced final-boundary
    snapshot, whose only job was making re-invocation a no-op — at the cost
    of serializing a full train-state fetch into every completed run
    (2.2 GB / ~190 s at the published stage-1 geometry; PERF.md round-4
    dispatch probe F)."""
    if not resume:
        return False
    try:
        with open(os.path.abspath(save_path) + ".meta.json") as f:
            done = int(json.load(f).get("completed_step", -1))
    except (OSError, ValueError, TypeError):
        return False
    if done >= max_steps:
        print(f"[{name}] checkpoint already records completed_step {done} "
              f">= max_steps {max_steps}; skipping (pass resume=False or "
              f"delete the checkpoint to retrain)")
        return True
    return False


# --------------------------------------------------------------------------
# stage-1 artifact loading (used by stages 2/3 + sampler)


def load_stage1_bundle(cfg: Config, stage1_ckpt: str, use_pallas: bool = False,
                       compute_dtype: str = "float32", fast_bn: bool = False,
                       bf16_head: bool = False, bf16_istft: bool = False):
    """-> (Stage1Model, FrozenStage1, Stage1Spec, meta).

    `compute_dtype`/`fast_bn`/`bf16_head`/`bf16_istft` set the INFERENCE
    compute mode of the loaded conv stacks (params stay fp32 in the
    checkpoint; bf16 halves decode HBM traffic — the generation pipeline is
    memory-bound like training; bf16_istft additionally halves the iSTFT
    frame traffic, the sampler's top block — PERF.md round-5)."""
    tree, meta = load_checkpoint(stage1_ckpt)
    spec = Stage1Spec.from_config(
        cfg, int(meta["input_length"]), int(meta["in_channels"]),
        use_pallas=use_pallas, compute_dtype=compute_dtype, fast_bn=fast_bn,
        bf16_head=bf16_head, bf16_istft=bf16_istft,
    )
    model = Stage1Model(spec)
    frozen = FrozenStage1(
        params=tree["params"],
        batch_stats=tree["batch_stats"],
        vq_l=codebook_from_dict(tree["vq_l"]),
        vq_h=codebook_from_dict(tree["vq_h"]),
    )
    return model, frozen, spec, meta


def _process_kwargs() -> dict:
    """Multi-host input feeding (SURVEY.md §5.8): under >1 JAX processes each
    host batches only its slice of the global batch; make_batches keeps the
    shuffle RNG host-identical so slices partition one global order."""
    pc = jax.process_count()
    if pc > 1:
        return {"process_index": jax.process_index(), "process_count": pc}
    return {}


# --------------------------------------------------------------------------
# device-resident training data
#
# TPU-first input path: the full train split lives in HBM (uploaded ONCE)
# and each training step derives its batch indices ON DEVICE from
# state.step (epoch permutation via jax.random.permutation + dynamic_slice)
# and gathers the batch from HBM — a steady-state step consumes ZERO
# per-step host->device traffic. This matters doubly here: (a) on any host,
# the input pipeline disappears from the critical path; (b) this
# environment's relayed backend has ~0.5-1.5 s latency per host->device
# transfer of ANY size (measured 2026-08-17: 1 MB device_put = 1.44 s, bulk
# rate ~27 MB/s at 128 MB), so even per-step index uploads would dominate.
# The gather is sharding-constrained to the data axis, so SPMD semantics
# are unchanged. Shuffle semantics match make_batches (fresh uniform
# permutation per epoch, remainder dropped); only the RNG stream differs
# (device threefry vs numpy), which is a documented non-semantic deviation.


_DEVICE_DATA_CACHE: dict = {}


def device_train_array(mesh, X: np.ndarray) -> jax.Array:
    """Upload X once per process, REPLICATED over the mesh, and memoize
    (keyed by the array object so stage chaining in one process reuses the
    same HBM buffer). Replication matters on >1 device: a plain
    jnp.asarray commits to device 0 only, and a mesh-jitted program
    gathering from it deadlocks the other devices at their first
    collective."""
    key = id(X)
    ent = _DEVICE_DATA_CACHE.get(key)
    if ent is None or ent[0] is not X:
        ent = (X, replicate_tree(mesh, jnp.asarray(X)))
        _DEVICE_DATA_CACHE[key] = ent
    return ent[1]


def _use_device_data(data_on_device: bool, X: np.ndarray,
                     max_bytes: int = 4 << 30) -> bool:
    return (
        data_on_device
        and jax.process_count() == 1
        and X.nbytes <= max_bytes
    )


def device_epoch_indices(data_key, step, N: int, batch_size: int):
    """On-device epoch-permutation batch indices for a (traced) step scalar:
    fresh permutation of [0, N) each epoch, contiguous batch_size slice per
    step, remainder dropped — make_batches(shuffle=True) semantics."""
    spe = max(N // batch_size, 1)
    epoch = step // spe
    perm = jax.random.permutation(jax.random.fold_in(data_key, epoch), N)
    i = (step % spe) * batch_size
    return jax.lax.dynamic_slice(perm, (i,), (batch_size,))


def make_device_data_step(step_fn, mesh, N: int, batch_size: int):
    """Wrap step_fn(state, *batch_arrays, rng) as
    g(state, arrays_tuple, data_key, rng): batch indices derive on device
    from state.step; each array in the tuple is gathered with the same
    indices and constrained to batch sharding (arrays replicated in HBM)."""
    from tvqvae_tpu.parallel.mesh import data_sharding

    def g(state, arrays, data_key, rng):
        idx = device_epoch_indices(data_key, state.step, N, batch_size)
        xs = []
        for a in arrays:
            x = jnp.take(a, idx, axis=0)
            xs.append(jax.lax.with_sharding_constraint(
                x, data_sharding(mesh, x.ndim)
            ))
        return step_fn(state, *xs, rng)

    return g


def make_multistep(device_step, n_steps: int):
    """Scan `device_step(state, arrays, data_key, rng)` n_steps times as ONE
    jitted program. Because batches derive on device from state.step, the
    bundle needs no stacked inputs and the host interacts once per n_steps
    optimizer steps — per-step dispatch latency vanishes (decisive for
    small steps like the precomputed-token stage-2). Metrics are bundle
    means; per-step semantics identical (the scan advances state.step)."""

    def bundled(state, arrays, data_key, rng):
        def body(st, _):
            st, m = device_step(st, arrays, data_key, rng)
            return st, m

        state, ms = jax.lax.scan(body, state, None, length=n_steps)
        return state, jax.tree.map(lambda a: jnp.mean(a, axis=0), ms)

    return bundled


def _adamw(cfg: Config, max_steps: int, bf16_mu: bool = False,
           bf16_nu: bool = False):
    """AdamW with the reference warmup-cosine schedule. `bf16_mu` stores
    the first moment in bfloat16: the AdamW update fusions are the top HBM
    consumer of the stage-1 step (PERF.md 'Roofline gap'), and halving the
    mu traffic is chip-measured at +2.4%% steps/s with the quality ladder
    unchanged (PERF.md round-4). `bf16_nu` does the same for the second
    moment (train.optim.adamw); update arithmetic stays fp32 in both cases
    — only storage precision changes. Both OFF -> exact optax.adamw."""
    from tvqvae_tpu.train.optim import adamw as adamw_storage

    return adamw_storage(
        warmup_cosine_schedule(
            cfg.exp_params.lr, max_steps, cfg.exp_params.linear_warmup_rate
        ),
        weight_decay=0.01,
        mu_dtype=jnp.bfloat16 if bf16_mu else None,
        nu_dtype=jnp.bfloat16 if bf16_nu else None,
    )


# --------------------------------------------------------------------------
# stage loops


def _loop(
    name: str,
    max_steps: int,
    train_once,
    eval_once,
    logger: Optional[RunLogger],
    val_interval: int,
    log_interval: int = 100,
    start_step: int = 0,
    snapshot=None,
    stride: int = 1,
    train_tail=None,
):
    """`stride` > 1: each train_once advances `stride` optimizer steps (a
    bundled lax.scan program); `step` stays in true-step units and the
    log/val cadences fire when their boundary is crossed within a bundle.
    A remainder that doesn't fill a bundle runs through `train_tail`
    (single-step) so the loop hits max_steps exactly; without train_tail
    the remainder is trimmed (with a notice)."""
    from tvqvae_tpu.utils.profiling import StepTimer

    timer = StepTimer()
    t0 = time.time()
    last = {"step": start_step, "t": t0}  # segment-rate anchor
    tail = (max_steps - start_step) % stride if stride > 1 else 0
    if tail and train_tail is None:
        print(
            f"[{name}] bundle stride {stride} trims max_steps to "
            f"{max_steps - tail} (from {max_steps})"
        )
        max_steps -= tail
        tail = 0

    def emit(step, metrics, width):
        timer.tick(width)
        if logger and (step % log_interval < width or step == max_steps):
            logger.log_metrics(
                {f"train/{k}": float(v) for k, v in metrics.items()}
                | timer.summary(),
                step,
            )
        if step % max(val_interval, 1) < width or step == max_steps:
            val = eval_once(step) if eval_once else {}
            now = time.time()
            rate = (step - start_step) / (now - t0)
            # Segment rate (since the previous val-boundary print) localizes
            # slowdowns that a cumulative average hides — the fullrun2
            # stage-1 final-quarter collapse was invisible until decoded by
            # hand from cumulative rates (PERF.md full-geometry run #2).
            seg = (step - last["step"]) / max(now - last["t"], 1e-9)
            last["step"], last["t"] = step, now
            line = " ".join(f"{k}={float(v):.4f}" for k, v in metrics.items())
            print(f"[{name}] step {step}/{max_steps} "
                  f"({rate:.1f} it/s cum, {seg:.1f} seg) {line}")
            if logger and val:
                logger.log_metrics(
                    {f"val/{k}": float(v) for k, v in val.items()}, step
                )
            if snapshot is not None:
                snapshot(step)

    for step in range(start_step + stride, max_steps - tail + 1, stride):
        emit(step, train_once(step), stride)
    for step in range(max_steps - tail + 1, max_steps + 1):
        emit(step, train_tail(step), 1)


def train_stage1(
    cfg: Config,
    data: DatasetSplits,
    save_path: str,
    logger: Optional[RunLogger] = None,
    max_steps: Optional[int] = None,
    use_pallas: bool = False,
    seed: int = 0,
    resume: bool = True,
    compute_dtype: str = "float32",
    bundle_steps: int = 1,
    data_on_device: bool = True,
    remat: bool = False,
    rng_impl: Optional[str] = None,
    fast_bn: bool = False,
    bf16_mu: bool = False,
    bf16_nu: bool = False,
    bf16_head: bool = False,
    bf16_istft: bool = False,
    tp: int = 1,
) -> str:
    mesh = _make_train_mesh(tp)
    batch_size = cfg.dataset.batch_sizes.get("stage1", 32)
    max_steps = max_steps or cfg.trainer_params.max_steps["stage1"]
    if _stage_completed(save_path, max_steps, resume, "stage1"):
        return save_path

    t_init = time.time()
    spec = Stage1Spec.from_config(
        cfg, data.input_length, data.in_channels, use_pallas=use_pallas,
        compute_dtype=compute_dtype, remat=remat, fast_bn=fast_bn,
        bf16_head=bf16_head, bf16_istft=bf16_istft,
    )
    x0 = jnp.asarray(data.X_train[:batch_size])
    model, params, batch_stats, vq_l, vq_h = init_stage1(
        jax.random.key(seed), spec, x0
    )
    print(f"[stage1] model init (incl. init-program compile): "
          f"{time.time() - t_init:.1f}s")
    tx = _adamw(cfg, max_steps, bf16_mu, bf16_nu)
    state = create_stage1_state(params, batch_stats, vq_l, vq_h, tx)
    snap_path = save_path + ".train"
    start_step = 0
    if resume and os.path.exists(snap_path):
        from tvqvae_tpu.utils.checkpoint import load_train_state

        state = load_train_state(snap_path, state)
        start_step = int(state.step)
        print(f"[stage1] resuming from step {start_step}")
    state = _place_state(mesh, state, tp)
    # Bundled stepping (bundle_steps > 1): one jitted lax.scan program
    # advances bundle_steps optimizer steps per host dispatch, hiding
    # host round-trip latency. Per-step semantics identical (see
    # make_stage1_train_multistep). Multi-host keeps per-step dispatch
    # (the per-process bundle assembly isn't wired through
    # make_process_global_batch). NOTE: benchmark before enabling on a
    # given backend — see PERF.md "bundled stepping" for this
    # environment's tunneled-backend caveat.
    bundle = bundle_steps if jax.process_count() == 1 else 1
    use_dev_data = _use_device_data(data_on_device, data.X_train)
    # rng_impl="rbg": XLA's counter-based generator for the training rng
    # (dropout masks) — ~10x cheaper per drawn bit than the default
    # threefry on TPU; statistical quality is ample for dropout. Measured
    # by tools/dropout_probe.py before recommending (default stays
    # threefry).
    rng = (jax.random.key(seed + 1) if rng_impl is None
           else jax.random.key(seed + 1, impl=rng_impl))
    state_box = [state]
    if use_dev_data:
        # batches gathered in HBM from the once-uploaded train split;
        # indices derive on device from state.step (zero per-step traffic).
        # bundle > 1 composes with this: make_multistep scans the
        # device-data step, so one host dispatch advances `bundle`
        # optimizer steps with per-step semantics intact (indices and
        # dropout keys both derive from state.step inside the scan).
        t_up = time.time()
        X_dev = device_train_array(mesh, data.X_train)
        jax.block_until_ready(X_dev)
        print(f"[stage1] train split -> HBM: "
              f"{data.X_train.nbytes / 1e6:.0f} MB in "
              f"{time.time() - t_up:.1f}s")
        data_key = jax.random.key(seed + 2)
        dstep = make_device_data_step(
            make_stage1_train_step(model, tx), mesh,
            len(data.X_train), batch_size,
        )
        gstep = jax.jit(
            make_multistep(dstep, bundle) if bundle > 1 else dstep,
            donate_argnums=0,
        )

        def train_once(step):
            state_box[0], metrics = gstep(
                state_box[0], (X_dev,), data_key, rng
            )
            return metrics
    else:
        if bundle > 1:
            from tvqvae_tpu.train.stage1 import make_stage1_train_multistep

            train_step = jax.jit(
                make_stage1_train_multistep(model, tx, bundle),
                donate_argnums=0,
            )
        else:
            train_step = jax.jit(
                make_stage1_train_step(model, tx), donate_argnums=0
            )
        raw_batches = make_batches(
            data.X_train, None, batch_size, shuffle=True, seed=seed,
            repeat=True, **_process_kwargs(),
        )
        if bundle > 1:
            def _stacked(it, k):
                while True:
                    xs = [next(it)[0] for _ in range(k)]
                    yield np.stack(xs), None

            batches = prefetch_batches(_stacked(raw_batches, bundle), mesh,
                                       bundled=True)
        else:
            batches = prefetch_batches(raw_batches, mesh)

        def train_once(step):
            xb, _ = next(batches)
            state_box[0], metrics = train_step(state_box[0], xb, rng)
            return metrics

    eval_fn_raw = make_stage1_eval_step(model, per_sample=True)
    if use_dev_data:
        from tvqvae_tpu.parallel.mesh import data_sharding

        Xe_dev = device_train_array(mesh, data.X_test)
        m_dev = mesh.devices.size
        bs_e = -(-min(batch_size, len(data.X_test)) // m_dev) * m_dev
        N_e = len(data.X_test)
        nb_e = -(-N_e // bs_e)

        def _eval_all(state, X_full):
            """Full-split validation as ONE jitted program: lax.map over
            fixed-shape batches with on-device indices and masked sums.
            The per-batch variant this replaces uploaded an index array and
            fetched every metric per batch — each transfer costs 0.5-1.5 s
            on the relay-backed device (~20-30 s per val boundary at the
            published geometry); this is one dispatch + one small fetch."""
            flat = jnp.arange(nb_e * bs_e)
            idx = (flat % N_e).reshape(nb_e, bs_e)
            valid = (flat < N_e).reshape(nb_e, bs_e)

            def body(args):
                ib, vb = args
                xe = jnp.take(X_full, ib, axis=0)
                xe = jax.lax.with_sharding_constraint(
                    xe, data_sharding(mesh, xe.ndim)
                )
                per, scalars, _ = eval_fn_raw(state, xe)
                # wrap-padded tail entries are masked out before summing,
                # so metrics are exact full-split means
                psum = {k: jnp.sum(jnp.where(vb, v, 0.0))
                        for k, v in per.items()}
                return psum, scalars

            psums, scalars = jax.lax.map(body, (idx, valid))
            out = {k: jnp.sum(v) / N_e for k, v in psums.items()}
            out.update({k: jnp.mean(v) for k, v in scalars.items()})
            return out

        eval_all = jax.jit(_eval_all)

        def eval_once(step):
            out = {k: float(v)
                   for k, v in eval_all(state_box[0], Xe_dev).items()}
            out["recons_loss.time"] = (
                out["recons_loss.LF.time"] + out["recons_loss.HF.time"]
            )
            # commit loss is 0 outside training (reference vq.py:362-366),
            # so the reference's val loss reduces to the recon terms.
            out["loss"] = out["recons_loss.time"]
            return out
    else:
        eval_step = jax.jit(eval_fn_raw)

        def eval_once(step):
            """Validate over the FULL test split in fixed-shape batches;
            the wrap-padded tail entries are dropped before averaging, so
            metrics are exact full-split means."""
            m = mesh.devices.size
            bs = -(-min(batch_size, len(data.X_test)) // m) * m
            N = len(data.X_test)
            sums: dict = {}
            scalar_sums: dict = {}
            n_batches = 0
            for s in range(0, N, bs):
                idx = np.arange(s, s + bs) % N
                real = min(bs, N - s)
                xe = shard_batch(mesh, jnp.asarray(data.X_test[idx]))
                per, scalars, _ = eval_step(state_box[0], xe)
                for k, v in per.items():
                    sums[k] = sums.get(k, 0.0) + float(jnp.sum(v[:real]))
                for k, v in scalars.items():
                    scalar_sums[k] = scalar_sums.get(k, 0.0) + float(v)
                n_batches += 1
            out = {k: v / N for k, v in sums.items()}
            out.update({k: v / n_batches for k, v in scalar_sums.items()})
            out["recons_loss.time"] = (
                out["recons_loss.LF.time"] + out["recons_loss.HF.time"]
            )
            out["loss"] = out["recons_loss.time"]
            return out

    # Bundling must not drop configured steps: a remainder that doesn't fill
    # a bundle runs through a single-step tail program so the loop hits
    # max_steps exactly (also covers resume with < bundle steps left,
    # which previously trained 0 steps).
    train_tail = None
    if bundle > 1 and (max_steps - start_step) % bundle:
        if use_dev_data:
            g1 = jax.jit(dstep, donate_argnums=0)

            def train_tail(step):
                state_box[0], m = g1(state_box[0], (X_dev,), data_key, rng)
                return m
        else:
            single_step = jax.jit(
                make_stage1_train_step(model, tx), donate_argnums=0
            )
            tail_batches = prefetch_batches(
                make_batches(data.X_train, None, batch_size, shuffle=True,
                             seed=seed + 7, repeat=True, **_process_kwargs()),
                mesh,
            )

            def train_tail(step):
                xb, _ = next(tail_batches)
                state_box[0], m = single_step(state_box[0], xb, rng)
                return m

    # The FINAL boundary does NOT snapshot: save_checkpoint below is the
    # stage artifact, and completed-stage idempotency now comes from the
    # meta's completed_step (_stage_completed) — the old forced snapshot
    # serialized a 2.2 GB state fetch (~190 s) into every completed run.
    snapshotter = AsyncSnapshotter(snap_path)
    t_loop = time.time()
    _loop("stage1", max_steps, train_once, eval_once, logger,
          cfg.trainer_params.val_check_interval.get("stage1", 5000),
          start_step=start_step, stride=bundle, train_tail=train_tail,
          snapshot=lambda step: (snapshotter(state_box[0])
                                 if step < max_steps else None))
    t_join = time.time()
    # final checkpoint below supersedes any in-flight snapshot
    snapshotter.abandon()

    state = state_box[0]
    t_save = time.time()
    save_checkpoint(
        save_path,
        {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "vq_l": codebook_to_dict(state.vq_l),
            "vq_h": codebook_to_dict(state.vq_h),
            "step": np.asarray(state.step),
        },
        meta=config_meta(cfg, data, completed_step=state.step),
    )
    print(f"[stage1] loop {t_join - t_loop:.1f}s, snapshot-join "
          f"{t_save - t_join:.1f}s, ckpt-save {time.time() - t_save:.1f}s")
    return save_path


def train_stage2(
    cfg: Config,
    data: DatasetSplits,
    stage1_ckpt: str,
    save_path: str,
    logger: Optional[RunLogger] = None,
    max_steps: Optional[int] = None,
    seed: int = 0,
    metrics=None,
    val_n_samples: Optional[int] = None,
    resume: bool = True,
    precompute: bool = True,
    bundle_steps: int = 1,
    bf16_mu: bool = False,
    bf16_nu: bool = False,
    tp: int = 1,
) -> str:
    mesh = _make_train_mesh(tp)
    batch_size = cfg.dataset.batch_sizes.get("stage2", 16)
    max_steps = max_steps or cfg.trainer_params.max_steps["stage2"]
    if _stage_completed(save_path, max_steps, resume, "stage2"):
        return save_path

    model, frozen, s1, _ = load_stage1_bundle(cfg, stage1_ckpt)
    spec = MaskGITSpec.from_config(cfg, s1)
    t_l, t_h = build_transformers(cfg, s1, data.n_classes)
    params, h_stats = init_stage2(jax.random.key(seed), t_l, t_h, spec)
    tx = _adamw(cfg, max_steps, bf16_mu, bf16_nu)
    state = create_stage2_state(params, h_stats, tx)
    snap_path = save_path + ".train"
    start_step = 0
    if resume and os.path.exists(snap_path):
        from tvqvae_tpu.utils.checkpoint import load_train_state

        state = load_train_state(snap_path, state)
        start_step = int(state.step)
        print(f"[stage2] resuming from step {start_step}")
    state = _place_state(mesh, state, tp)
    # the frozen stage-1 bundle is read-only context: keep it replicated
    frozen = replicate_tree(mesh, frozen)

    rng = jax.random.key(seed + 1)
    state_box = [state]
    bundle = 1
    train_tail = None
    # Precomputed-token path (default): the stage-1 encode is deterministic
    # (eval BN + argmax VQ), so ONE eval sweep turns X_train into token
    # grids and the train step is pure transformer compute — instead of
    # re-running both frozen conv encoders every step (reference
    # maskgit.py:167-168). Multi-host keeps the on-the-fly path (the
    # precompute sweep isn't wired through the per-process feed).
    precompute = precompute and jax.process_count() == 1
    if precompute:
        from tvqvae_tpu.train.stage2 import (
            make_stage2_train_step_tokens,
            precompute_token_dataset,
        )

        t0 = time.time()
        # feed the sweep from the HBM-cached train split when possible
        src = (
            device_train_array(mesh, data.X_train)
            if _use_device_data(True, data.X_train) else data.X_train
        )
        tok_l, tok_h = precompute_token_dataset(
            model, frozen, src, batch_size=max(batch_size, 64),
            mesh=mesh,
        )
        print(f"[stage2] precomputed {len(tok_l)} token rows in "
              f"{time.time() - t0:.1f}s")
        token_step_raw = make_stage2_train_step_tokens(t_l, t_h, spec, tx)
        # token arrays are tiny (N x ~135 int32) — device-resident, with
        # batch indices derived on device from state.step
        tok_l_dev = replicate_tree(mesh, jnp.asarray(tok_l))
        tok_h_dev = replicate_tree(mesh, jnp.asarray(tok_h))
        data_key = jax.random.key(seed + 2)
        if data.y_train is not None:
            y_dev = replicate_tree(mesh, jnp.asarray(data.y_train))
            arrays = (tok_l_dev, tok_h_dev, y_dev)
            step_body = token_step_raw
        else:
            arrays = (tok_l_dev, tok_h_dev)

            def step_body(state, s_l, s_h, rng):
                return token_step_raw(state, s_l, s_h, None, rng)

        dstep = make_device_data_step(step_body, mesh, len(tok_l), batch_size)
        bundle = bundle_steps if jax.process_count() == 1 else 1
        token_gstep = jax.jit(
            make_multistep(dstep, bundle) if bundle > 1 else dstep,
            donate_argnums=0,
        )
        if bundle > 1 and (max_steps - start_step) % bundle:
            token_g1 = jax.jit(dstep, donate_argnums=0)

            def train_tail(step):
                state_box[0], m = token_g1(
                    state_box[0], arrays, data_key, rng
                )
                return m

        def train_once(step):
            state_box[0], m = token_gstep(
                state_box[0], arrays, data_key, rng
            )
            return m
    else:
        step_fn = jax.jit(
            make_stage2_train_step(model, t_l, t_h, spec, tx),
            donate_argnums=0,
        )
        batches = prefetch_batches(
            make_batches(data.X_train, data.y_train, batch_size, shuffle=True,
                         seed=seed, repeat=True, **_process_kwargs()),
            mesh,
        )

        def train_once(step):
            xb, yb = next(batches)
            state_box[0], m = step_fn(state_box[0], frozen, xb, yb, rng)
            return m

    # validation-time sampling metrics (reference stage2.py:87-109)
    eval_once = None
    if metrics is not None:
        from tvqvae_tpu.train.stage2 import make_sampling_fn

        n_val = val_n_samples or min(
            cfg.evaluation.min_num_gen_samples, 1024
        )
        vbatch = cfg.evaluation.batch_size
        # fan the val-time sampler out over the mesh when shapes allow
        sample_fn = make_sampling_fn(
            model, t_l, t_h, spec,
            mesh=mesh if vbatch % mesh.devices.size == 0 else None,
        )

        def eval_once(step):
            st = state_box[0]
            vrng = jax.random.key(10_000 + step)
            xs = []
            done = 0
            while done < n_val:
                vrng, r = jax.random.split(vrng)
                _, _, x = sample_fn(frozen, st.params, st.h_stats, r, vbatch, None)
                xs.append(np.asarray(x))
                done += vbatch
            x = np.concatenate(xs)[:n_val]
            z = metrics.z_gen_fn(x)
            # val-time monitoring: the exact SVD trace identity (~50x faster
            # than the reference's Schur sqrtm at these shapes; eval_utils)
            fid = metrics.fid_score(metrics.z_test, z, method="svd")
            mdd, acd, sd, kd = metrics.stat_metrics(metrics.X_test, x)
            return {
                "running_metrics/FID": fid, "running_metrics/MDD": mdd,
                "running_metrics/ACD": acd, "running_metrics/SD": sd,
                "running_metrics/KD": kd,
            }

    # final boundary does not snapshot — see the stage-1 note
    snapshotter = AsyncSnapshotter(snap_path)
    _loop("stage2", max_steps, train_once, eval_once, logger,
          cfg.trainer_params.val_check_interval.get("stage2", 10000),
          start_step=start_step, stride=bundle, train_tail=train_tail,
          snapshot=lambda step: (snapshotter(state_box[0])
                                 if step < max_steps else None))
    # final checkpoint below supersedes any in-flight snapshot
    snapshotter.abandon()

    state = state_box[0]
    save_checkpoint(
        save_path,
        {
            "params": state.params,
            "h_stats": state.h_stats,
            "step": np.asarray(state.step),
        },
        meta=config_meta(cfg, data, completed_step=state.step),
    )
    return save_path


def train_stage3(
    cfg: Config,
    data: DatasetSplits,
    stage1_ckpt: str,
    save_path: str,
    logger: Optional[RunLogger] = None,
    max_steps: Optional[int] = None,
    tau: float = 0.0,
    seed: int = 0,
    stage2_ckpt: Optional[str] = None,
    metrics=None,
    val_n_samples: Optional[int] = None,
    resume: bool = True,
    precompute: bool = True,
    bundle_steps: int = 1,
    compute_dtype: str = "float32",
    fast_norm: bool = False,
    bf16_mu: bool = False,
    bf16_nu: bool = False,
    tp: int = 1,
) -> str:
    mesh = _make_train_mesh(tp)
    batch_size = cfg.dataset.batch_sizes.get("stage3", 16)
    max_steps = max_steps or cfg.trainer_params.max_steps["stage3"]
    if _stage_completed(save_path, max_steps, resume, "stage3"):
        return save_path

    model, frozen, s1, _ = load_stage1_bundle(cfg, stage1_ckpt)
    fe = FidelityEnhancer(
        input_length=data.input_length,
        in_channels=data.in_channels,
        dim=cfg.fidelity_enhancer.dim,
        dim_mults=tuple(cfg.fidelity_enhancer.dim_mults),
        resnet_block_groups=cfg.fidelity_enhancer.resnet_block_groups,
        dropout=cfg.fidelity_enhancer.dropout,
        compute_dtype=compute_dtype,
        fast_norm=fast_norm,
    )
    x0 = jnp.asarray(data.X_train[: min(4, batch_size)])
    params = init_stage3(jax.random.key(seed), fe, x0)
    tx = _adamw(cfg, max_steps, bf16_mu, bf16_nu)
    state = create_stage3_state(params, tx, tau)
    snap_path = save_path + ".train"
    start_step = 0
    if resume and os.path.exists(snap_path):
        from tvqvae_tpu.utils.checkpoint import load_train_state

        state = load_train_state(snap_path, state)
        start_step = int(state.step)
        print(f"[stage3] resuming from step {start_step}")
    state = _place_state(mesh, state, tp)
    # the frozen stage-1 bundle is read-only context: keep it replicated
    frozen = replicate_tree(mesh, frozen)

    rng = jax.random.key(seed + 1)
    state_box = [state]
    bundle = 1
    train_tail = None
    # Precomputed-x' path (default at tau=0): the tau=0 SVQ roundtrip is
    # deterministic (argmax VQ + eval BN), so ONE sweep precomputes x' for
    # the whole train set and the step is pure U-Net compute — instead of
    # re-running the frozen encoder/decoder pair every step (reference
    # stage3.py:205-210). tau > 0 (stochastic x') and multi-host keep the
    # on-the-fly path.
    precompute = precompute and tau == 0.0 and jax.process_count() == 1
    if precompute:
        from tvqvae_tpu.train.stage3 import (
            make_stage3_train_step_pre,
            precompute_xprime_dataset,
        )

        pre_step_raw = make_stage3_train_step_pre(
            fe, tx,
            percept_loss_weight=cfg.fidelity_enhancer.percept_loss_weight,
        )
        use_dev = _use_device_data(True, data.X_train)
        t0 = time.time()
        if use_dev:
            # fully chip-local: x' computed from and stored in HBM; steps
            # gather (x, x') pairs by index
            from tvqvae_tpu.parallel.mesh import data_sharding

            X_dev = device_train_array(mesh, data.X_train)
            xprime = precompute_xprime_dataset(
                model, frozen, X_dev, batch_size=max(batch_size, 32),
                mesh=mesh, keep_on_device=True,
            )
            print(f"[stage3] precomputed {xprime.shape[0]} x' rows "
                  f"(device-resident) in {time.time() - t0:.1f}s")
            data_key = jax.random.key(seed + 2)
            dstep3 = make_device_data_step(
                pre_step_raw, mesh, len(data.X_train), batch_size
            )
            bundle = bundle_steps if jax.process_count() == 1 else 1
            pre_g = jax.jit(
                make_multistep(dstep3, bundle) if bundle > 1 else dstep3,
                donate_argnums=0,
            )
            if bundle > 1 and (max_steps - start_step) % bundle:
                g1 = jax.jit(dstep3, donate_argnums=0)

                def train_tail(step):
                    state_box[0], m = g1(
                        state_box[0], (X_dev, xprime), data_key, rng
                    )
                    return m

            def train_once(step):
                state_box[0], m = pre_g(
                    state_box[0], (X_dev, xprime), data_key, rng
                )
                return m
        else:
            xprime = precompute_xprime_dataset(
                model, frozen, data.X_train, batch_size=max(batch_size, 32),
                mesh=mesh,
            )
            print(f"[stage3] precomputed {len(xprime)} x' rows in "
                  f"{time.time() - t0:.1f}s")
            pre_step = jax.jit(pre_step_raw, donate_argnums=0)
            # x' rides the label slot of the batcher (same index selection)
            batches = prefetch_batches(
                make_batches(data.X_train, xprime, batch_size, shuffle=True,
                             seed=seed, repeat=True),
                mesh,
            )

            def train_once(step):
                xb, xpb = next(batches)
                state_box[0], m = pre_step(state_box[0], xb, xpb, rng)
                return m
    else:
        step_fn = jax.jit(
            make_stage3_train_step(
                model, fe, tx, tau=tau,
                percept_loss_weight=cfg.fidelity_enhancer.percept_loss_weight,
            ),
            donate_argnums=0,
        )
        batches = prefetch_batches(
            make_batches(data.X_train, None, batch_size, shuffle=True,
                         seed=seed, repeat=True, **_process_kwargs()),
            mesh,
        )

        def train_once(step):
            xb, _ = next(batches)
            state_box[0], m = step_fn(state_box[0], frozen, xb, rng)
            return m

    # validation-time sampling metrics with/without FE
    # (reference stage3.py:264-336)
    eval_once = None
    if metrics is not None and stage2_ckpt is not None:
        from tvqvae_tpu.models.maskgit import MaskGITSpec, build_transformers
        from tvqvae_tpu.train.stage2 import make_sampling_fn
        from tvqvae_tpu.utils.checkpoint import load_checkpoint

        tree2, meta2 = load_checkpoint(stage2_ckpt)
        spec = MaskGITSpec.from_config(cfg, s1)
        t_l, t_h = build_transformers(
            cfg, s1, data.n_classes,
            force_projections=bool((meta2 or {}).get("force_projections")),
        )
        n_val = val_n_samples or min(
            cfg.evaluation.min_num_gen_samples, 1024
        )
        vbatch = cfg.evaluation.batch_size
        # fan the val-time sampler out over the mesh when shapes allow
        sample_fn = make_sampling_fn(
            model, t_l, t_h, spec,
            mesh=mesh if vbatch % mesh.devices.size == 0 else None,
        )
        fe_apply = jax.jit(
            lambda p, x: fe.apply({"params": p}, x, False)
        )

        def eval_once(step):
            st = state_box[0]
            vrng = jax.random.key(20_000 + step)
            xs = []
            done = 0
            while done < n_val:
                vrng, r = jax.random.split(vrng)
                _, _, x = sample_fn(
                    frozen, tree2["params"], tree2.get("h_stats", {}), r,
                    vbatch, None,
                )
                xs.append(np.asarray(x))
                done += vbatch
            x = np.concatenate(xs)[:n_val]
            x_fe = np.concatenate([
                np.asarray(fe_apply(st.params, jnp.asarray(x[i:i + vbatch])))
                for i in range(0, len(x), vbatch)
            ])
            out = {}
            for tag, arr in [("", x), (" with FE", x_fe)]:
                z = metrics.z_gen_fn(arr)
                out[f"running_metrics/FID{tag}"] = metrics.fid_score(
                    metrics.z_test, z, method="svd"
                )
                mdd, acd, sd, kd = metrics.stat_metrics(metrics.X_test, arr)
                out[f"running_metrics/MDD{tag}"] = mdd
                out[f"running_metrics/ACD{tag}"] = acd
                out[f"running_metrics/SD{tag}"] = sd
                out[f"running_metrics/KD{tag}"] = kd
            return out

    # final boundary does not snapshot — see the stage-1 note
    snapshotter = AsyncSnapshotter(snap_path)
    _loop("stage3", max_steps, train_once, eval_once, logger,
          cfg.trainer_params.val_check_interval.get("stage3", 2500),
          start_step=start_step, stride=bundle, train_tail=train_tail,
          snapshot=lambda step: (snapshotter(state_box[0])
                                 if step < max_steps else None))
    # final checkpoint below supersedes any in-flight snapshot
    snapshotter.abandon()

    state = state_box[0]
    save_checkpoint(
        save_path,
        {
            "params": state.params,
            "tau": np.asarray(state.tau),
            "step": np.asarray(state.step),
        },
        meta=config_meta(cfg, data, completed_step=state.step),
    )
    return save_path


def train_fcn(
    cfg: Config,
    data: DatasetSplits,
    save_path: str,
    logger: Optional[RunLogger] = None,
    max_epochs: int = 1000,
    batch_size: int = 256,
    lr: float = 1e-3,
    weight_decay: float = 1e-5,
    seed: int = 0,
) -> str:
    """Supervised FCN classifier training (reference scripts/train_fcn.py;
    note the reference caps Lightning at max_steps=max_epochs — i.e. 1000
    optimization STEPS — train_fcn.py:237; we train true steps with a cosine
    schedule over the same count for parity, configurable upward)."""
    mesh = make_mesh()
    max_steps = max_epochs  # parity with the reference's effective budget

    fcn = FCN(n_classes=data.n_classes)
    x0 = jnp.asarray(data.X_train[: min(8, batch_size)])
    # jitted: one cacheable init program (see models/stage1.py init_stage1)
    variables = jax.jit(
        lambda r, x: fcn.init({"params": r}, x, True)
    )(jax.random.key(seed), x0)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    sched = optax.cosine_decay_schedule(lr, max_steps)
    tx = optax.adamw(sched, weight_decay=weight_decay)
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, batch_stats, opt_state, xb, yb):
        def loss_fn(p):
            logits, mut = fcn.apply(
                {"params": p, "batch_stats": batch_stats}, xb, True,
                mutable=["batch_stats"],
            )
            onehot = jax.nn.one_hot(yb[:, 0], data.n_classes)
            ce = optax.softmax_cross_entropy(logits, onehot).mean()
            acc = (logits.argmax(-1) == yb[:, 0]).mean()
            return ce, (mut, acc)

        (ce, (mut, acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, mut["batch_stats"], opt_state, ce, acc

    bs = min(batch_size, len(data.X_train))
    if _use_device_data(True, data.X_train):
        # device-resident: X/y uploaded once; batch indices derive ON DEVICE
        # from a carried step scalar (zero per-step host->device traffic,
        # same pattern as the stage loops)
        from tvqvae_tpu.parallel.mesh import data_sharding

        X_dev = device_train_array(mesh, data.X_train)
        y_dev = replicate_tree(mesh, jnp.asarray(data.y_train))
        data_key = jax.random.key(seed + 2)
        N = len(data.X_train)

        # X/y ride as ARGUMENTS, not closures: a closed-over jax.Array is
        # embedded in the compiled program as a constant, which at full
        # geometry (440 MB train split) exceeds the remote-compile request
        # limit (HTTP 413) — and would be re-uploaded per compile besides.
        @jax.jit
        def dev_step(params, batch_stats, opt_state, step_c, X, y):
            idx = device_epoch_indices(data_key, step_c, N, bs)
            xb = jax.lax.with_sharding_constraint(
                jnp.take(X, idx, axis=0), data_sharding(mesh, X.ndim)
            )
            yb = jax.lax.with_sharding_constraint(
                jnp.take(y, idx, axis=0), data_sharding(mesh, y.ndim)
            )
            params, batch_stats, opt_state, ce, acc = step_fn(
                params, batch_stats, opt_state, xb, yb
            )
            return params, batch_stats, opt_state, step_c + 1, ce, acc

        step_c = jnp.int32(0)
        for step in range(1, max_steps + 1):
            params, batch_stats, opt_state, step_c, ce, acc = dev_step(
                params, batch_stats, opt_state, step_c, X_dev, y_dev
            )
            if logger and step % 50 == 0:
                logger.log_metrics(
                    {"train/loss": float(ce), "train/acc": float(acc)}, step
                )
            if step % 200 == 0 or step == max_steps:
                print(f"[fcn] step {step}/{max_steps} ce={float(ce):.4f} "
                      f"acc={float(acc):.3f}")
        save_checkpoint(
            save_path,
            {"params": params, "batch_stats": batch_stats},
            meta=config_meta(cfg, data),
        )
        return save_path

    raw = make_batches(
        data.X_train, data.y_train, bs, shuffle=True, seed=seed,
        repeat=True,
    )
    batches = (
        shard_batch(mesh, (jnp.asarray(xb), jnp.asarray(yb)))
        for xb, yb in raw
    )
    for step in range(1, max_steps + 1):
        xb, yb = next(batches)
        params, batch_stats, opt_state, ce, acc = step_fn(
            params, batch_stats, opt_state, xb, yb
        )
        if logger and step % 50 == 0:
            logger.log_metrics(
                {"train/loss": float(ce), "train/acc": float(acc)}, step
            )
        if step % 200 == 0 or step == max_steps:
            print(f"[fcn] step {step}/{max_steps} ce={float(ce):.4f} acc={float(acc):.3f}")

    save_checkpoint(
        save_path,
        {"params": params, "batch_stats": batch_stats},
        meta=config_meta(cfg, data),
    )
    return save_path


def load_fcn_bundle(fcn_ckpt: str):
    tree, meta = load_checkpoint(fcn_ckpt)
    return {
        "params": tree["params"],
        "batch_stats": tree.get("batch_stats", {}),
    }, meta
