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
from tvqvae_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from tvqvae_tpu.utils.logging import RunLogger
from tvqvae_tpu.utils.schedule import warmup_cosine_schedule


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


def config_meta(cfg: Config, data: DatasetSplits) -> dict:
    return {
        "config": dataclasses.asdict(cfg),
        "input_length": int(data.input_length),
        "in_channels": int(data.in_channels),
        "n_classes": int(data.n_classes),
    }


# --------------------------------------------------------------------------
# stage-1 artifact loading (used by stages 2/3 + sampler)


def load_stage1_bundle(cfg: Config, stage1_ckpt: str, use_pallas: bool = False):
    """-> (Stage1Model, FrozenStage1, Stage1Spec, meta)."""
    tree, meta = load_checkpoint(stage1_ckpt)
    spec = Stage1Spec.from_config(
        cfg, int(meta["input_length"]), int(meta["in_channels"]),
        use_pallas=use_pallas,
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
):
    """`stride` > 1: each train_once advances `stride` optimizer steps (a
    bundled lax.scan program); `step` stays in true-step units and the
    log/val cadences fire when their boundary is crossed within a bundle."""
    from tvqvae_tpu.utils.profiling import StepTimer

    timer = StepTimer()
    t0 = time.time()
    if stride > 1 and (max_steps - start_step) % stride:
        trimmed = (max_steps - start_step) // stride * stride
        print(
            f"[{name}] bundle stride {stride} trims max_steps to "
            f"{start_step + trimmed} (from {max_steps})"
        )
        max_steps = start_step + trimmed
    for step in range(start_step + stride, max_steps + 1, stride):
        metrics = train_once(step)
        timer.tick(stride)
        if logger and (step % log_interval < stride or step == max_steps):
            logger.log_metrics(
                {f"train/{k}": float(v) for k, v in metrics.items()}
                | timer.summary(),
                step,
            )
        if step % max(val_interval, 1) < stride or step == max_steps:
            val = eval_once(step) if eval_once else {}
            rate = (step - start_step) / (time.time() - t0)
            line = " ".join(f"{k}={float(v):.4f}" for k, v in metrics.items())
            print(f"[{name}] step {step}/{max_steps} ({rate:.1f} it/s) {line}")
            if logger and val:
                logger.log_metrics(
                    {f"val/{k}": float(v) for k, v in val.items()}, step
                )
            if snapshot is not None:
                snapshot(step)


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
) -> str:
    mesh = make_mesh()
    batch_size = cfg.dataset.batch_sizes.get("stage1", 32)
    max_steps = max_steps or cfg.trainer_params.max_steps["stage1"]

    spec = Stage1Spec.from_config(
        cfg, data.input_length, data.in_channels, use_pallas=use_pallas,
        compute_dtype=compute_dtype,
    )
    x0 = jnp.asarray(data.X_train[:batch_size])
    model, params, batch_stats, vq_l, vq_h = init_stage1(
        jax.random.key(seed), spec, x0
    )
    tx = optax.adamw(
        warmup_cosine_schedule(
            cfg.exp_params.lr, max_steps, cfg.exp_params.linear_warmup_rate
        ),
        weight_decay=0.01,
    )
    state = create_stage1_state(params, batch_stats, vq_l, vq_h, tx)
    snap_path = save_path + ".train"
    start_step = 0
    if resume and os.path.exists(snap_path):
        from tvqvae_tpu.utils.checkpoint import load_train_state

        state = load_train_state(snap_path, state)
        start_step = int(state.step)
        print(f"[stage1] resuming from step {start_step}")
    state = replicate_tree(mesh, state)
    # Bundled stepping (bundle_steps > 1): one jitted lax.scan program
    # advances bundle_steps optimizer steps per host dispatch, hiding
    # host round-trip latency. Per-step semantics identical (see
    # make_stage1_train_multistep). Multi-host keeps per-step dispatch
    # (the per-process bundle assembly isn't wired through
    # make_process_global_batch). NOTE: benchmark before enabling on a
    # given backend — see PERF.md "bundled stepping" for this
    # environment's tunneled-backend caveat.
    bundle = bundle_steps if jax.process_count() == 1 else 1
    if bundle > 1:
        from tvqvae_tpu.train.stage1 import make_stage1_train_multistep

        train_step = jax.jit(
            make_stage1_train_multistep(model, tx, bundle), donate_argnums=0
        )
    else:
        train_step = jax.jit(
            make_stage1_train_step(model, tx), donate_argnums=0
        )
    eval_step = jax.jit(make_stage1_eval_step(model, per_sample=True))

    rng = jax.random.key(seed + 1)
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
    state_box = [state]

    def train_once(step):
        xb, _ = next(batches)
        state_box[0], metrics = train_step(state_box[0], xb, rng)
        return metrics

    def eval_once(step):
        """Validate over the FULL test split in fixed-shape batches (one
        compiled program); the wrap-padded tail entries are dropped before
        averaging, so metrics are exact full-split means."""
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
        # commit loss is 0 outside training (reference vq.py:362-366), so the
        # reference's val loss reduces to the recon terms.
        out["loss"] = out["recons_loss.time"]
        return out

    from tvqvae_tpu.utils.checkpoint import save_train_state

    _loop("stage1", max_steps, train_once, eval_once, logger,
          cfg.trainer_params.val_check_interval.get("stage1", 5000),
          start_step=start_step, stride=bundle,
          snapshot=lambda step: save_train_state(snap_path, state_box[0]))

    state = state_box[0]
    save_checkpoint(
        save_path,
        {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "vq_l": codebook_to_dict(state.vq_l),
            "vq_h": codebook_to_dict(state.vq_h),
            "step": np.asarray(state.step),
        },
        meta=config_meta(cfg, data),
    )
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
) -> str:
    mesh = make_mesh()
    batch_size = cfg.dataset.batch_sizes.get("stage2", 16)
    max_steps = max_steps or cfg.trainer_params.max_steps["stage2"]

    model, frozen, s1, _ = load_stage1_bundle(cfg, stage1_ckpt)
    spec = MaskGITSpec.from_config(cfg, s1)
    t_l, t_h = build_transformers(cfg, s1, data.n_classes)
    params, h_stats = init_stage2(jax.random.key(seed), t_l, t_h, spec)
    tx = optax.adamw(
        warmup_cosine_schedule(
            cfg.exp_params.lr, max_steps, cfg.exp_params.linear_warmup_rate
        ),
        weight_decay=0.01,
    )
    state = create_stage2_state(params, h_stats, tx)
    snap_path = save_path + ".train"
    start_step = 0
    if resume and os.path.exists(snap_path):
        from tvqvae_tpu.utils.checkpoint import load_train_state

        state = load_train_state(snap_path, state)
        start_step = int(state.step)
        print(f"[stage2] resuming from step {start_step}")
    state = replicate_tree(mesh, state)
    frozen = replicate_tree(mesh, frozen)
    step_fn = jax.jit(
        make_stage2_train_step(model, t_l, t_h, spec, tx), donate_argnums=0
    )

    rng = jax.random.key(seed + 1)
    batches = prefetch_batches(
        make_batches(data.X_train, data.y_train, batch_size, shuffle=True,
                     seed=seed, repeat=True, **_process_kwargs()),
        mesh,
    )
    state_box = [state]

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
            fid = metrics.fid_score(metrics.z_test, z)
            mdd, acd, sd, kd = metrics.stat_metrics(metrics.X_test, x)
            return {
                "running_metrics/FID": fid, "running_metrics/MDD": mdd,
                "running_metrics/ACD": acd, "running_metrics/SD": sd,
                "running_metrics/KD": kd,
            }

    from tvqvae_tpu.utils.checkpoint import save_train_state

    _loop("stage2", max_steps, train_once, eval_once, logger,
          cfg.trainer_params.val_check_interval.get("stage2", 10000),
          start_step=start_step,
          snapshot=lambda step: save_train_state(snap_path, state_box[0]))

    state = state_box[0]
    save_checkpoint(
        save_path,
        {
            "params": state.params,
            "h_stats": state.h_stats,
            "step": np.asarray(state.step),
        },
        meta=config_meta(cfg, data),
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
) -> str:
    mesh = make_mesh()
    batch_size = cfg.dataset.batch_sizes.get("stage3", 16)
    max_steps = max_steps or cfg.trainer_params.max_steps["stage3"]

    model, frozen, s1, _ = load_stage1_bundle(cfg, stage1_ckpt)
    fe = FidelityEnhancer(
        input_length=data.input_length,
        in_channels=data.in_channels,
        dim=cfg.fidelity_enhancer.dim,
        dim_mults=tuple(cfg.fidelity_enhancer.dim_mults),
        resnet_block_groups=cfg.fidelity_enhancer.resnet_block_groups,
        dropout=cfg.fidelity_enhancer.dropout,
    )
    x0 = jnp.asarray(data.X_train[: min(4, batch_size)])
    params = init_stage3(jax.random.key(seed), fe, x0)
    tx = optax.adamw(
        warmup_cosine_schedule(
            cfg.exp_params.lr, max_steps, cfg.exp_params.linear_warmup_rate
        ),
        weight_decay=0.01,
    )
    state = create_stage3_state(params, tx, tau)
    snap_path = save_path + ".train"
    start_step = 0
    if resume and os.path.exists(snap_path):
        from tvqvae_tpu.utils.checkpoint import load_train_state

        state = load_train_state(snap_path, state)
        start_step = int(state.step)
        print(f"[stage3] resuming from step {start_step}")
    state = replicate_tree(mesh, state)
    frozen = replicate_tree(mesh, frozen)
    step_fn = jax.jit(
        make_stage3_train_step(
            model, fe, tx, tau=tau,
            percept_loss_weight=cfg.fidelity_enhancer.percept_loss_weight,
        ),
        donate_argnums=0,
    )

    rng = jax.random.key(seed + 1)
    batches = prefetch_batches(
        make_batches(data.X_train, None, batch_size, shuffle=True, seed=seed,
                     repeat=True, **_process_kwargs()),
        mesh,
    )
    state_box = [state]

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

        tree2, _ = load_checkpoint(stage2_ckpt)
        spec = MaskGITSpec.from_config(cfg, s1)
        t_l, t_h = build_transformers(cfg, s1, data.n_classes)
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
                    metrics.z_test, z
                )
                mdd, acd, sd, kd = metrics.stat_metrics(metrics.X_test, arr)
                out[f"running_metrics/MDD{tag}"] = mdd
                out[f"running_metrics/ACD{tag}"] = acd
                out[f"running_metrics/SD{tag}"] = sd
                out[f"running_metrics/KD{tag}"] = kd
            return out

    from tvqvae_tpu.utils.checkpoint import save_train_state

    _loop("stage3", max_steps, train_once, eval_once, logger,
          cfg.trainer_params.val_check_interval.get("stage3", 2500),
          start_step=start_step,
          snapshot=lambda step: save_train_state(snap_path, state_box[0]))

    state = state_box[0]
    save_checkpoint(
        save_path,
        {
            "params": state.params,
            "tau": np.asarray(state.tau),
            "step": np.asarray(state.step),
        },
        meta=config_meta(cfg, data),
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
    variables = fcn.init({"params": jax.random.key(seed)}, x0, True)
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

    batches = make_batches(
        data.X_train, data.y_train, min(batch_size, len(data.X_train)),
        shuffle=True, seed=seed, repeat=True,
    )
    for step in range(1, max_steps + 1):
        xb, yb = next(batches)
        xb, yb = shard_batch(mesh, (jnp.asarray(xb), jnp.asarray(yb)))
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
