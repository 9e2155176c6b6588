"""Benchmark: stage-1 training throughput + generation throughput on the
published config (BASELINE.json north-star: "Gen trajectories/sec/chip;
stage-1 steps/sec").

Runs on the real TPU chip (default env platform). Shapes are the published
EHAM->LIMC workload: 4 channels, L=4633, hid_dim 128, LF/HF codebooks 32,
prior transformers 4/1 layers, T=10/1 decode steps (BASELINE.md). Prints
one JSON line.

vs_baseline: the reference publishes no wall-clock numbers (BASELINE.md —
"Throughput: not published"). We normalize against an estimated 10 stage-1
steps/s for the reference PyTorch Lightning single-GPU trainer at this model
size (conservative; replaced if a measured reference number materializes).
"""

import json
import time

import numpy as np

BASELINE_STAGE1_STEPS_PER_SEC = 10.0  # estimated reference single-GPU rate


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from tvqvae_tpu.config import Config
    from tvqvae_tpu.models import Stage1Spec, init_stage1
    from tvqvae_tpu.models.maskgit import FrozenStage1, MaskGITSpec, build_transformers
    from tvqvae_tpu.train import make_stage1_train_step
    from tvqvae_tpu.train.stage1 import create_stage1_state
    from tvqvae_tpu.train.stage2 import init_stage2, make_sampling_fn
    from tvqvae_tpu.utils import warmup_cosine_schedule

    cfg = Config()  # full published config
    B, C, L = 32, 4, 4633
    spec = Stage1Spec.from_config(cfg, L, C)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, C, L)), jnp.float32
    )

    model, params, batch_stats, vq_l, vq_h = init_stage1(
        jax.random.key(0), spec, x
    )
    tx = optax.adamw(warmup_cosine_schedule(1e-3, 50000), weight_decay=0.01)
    state = create_stage1_state(params, batch_stats, vq_l, vq_h, tx)
    step = jax.jit(make_stage1_train_step(model, tx), donate_argnums=0)
    rng = jax.random.key(1)

    state, m = step(state, x, rng)  # compile
    jax.block_until_ready(m)
    n = 30
    t0 = time.time()
    for _ in range(n):
        state, m = step(state, x, rng)
    jax.block_until_ready(m)
    stage1_sps = n / (time.time() - t0)

    # generation throughput: full iterative decode + both decoders, B=256
    frozen = FrozenStage1(
        params=state.params, batch_stats=state.batch_stats,
        vq_l=state.vq_l, vq_h=state.vq_h,
    )
    mg = MaskGITSpec.from_config(cfg, spec)
    t_l, t_h = build_transformers(cfg, spec, n_classes=5)
    p2, h_stats = init_stage2(jax.random.key(2), t_l, t_h, mg)
    sample_fn = make_sampling_fn(model, t_l, t_h, mg)
    GB = 256
    out = jax.block_until_ready(
        sample_fn(frozen, p2, h_stats, jax.random.key(3), GB, None)
    )
    t0 = time.time()
    for i in range(10):
        out = sample_fn(
            frozen, p2, h_stats, jax.random.fold_in(jax.random.key(4), i),
            GB, None,
        )
    jax.block_until_ready(out)
    gen_tps = GB / ((time.time() - t0) / 10)

    print(json.dumps({
        "metric": "stage1_train_steps_per_sec",
        "value": round(stage1_sps, 3),
        "unit": "steps/s (B=32, C=4, L=4633, published config, 1 chip)",
        "vs_baseline": round(stage1_sps / BASELINE_STAGE1_STEPS_PER_SEC, 3),
        "extra": {
            "gen_trajectories_per_sec_per_chip": round(gen_tps, 1),
            "gen_batch": GB,
            "decode_steps": {"lf": mg.T_l, "hf": mg.T_h},
        },
    }))


if __name__ == "__main__":
    main()
