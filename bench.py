"""Benchmark: stage-1 VQ-VAE training throughput on the published config.

Runs on the real TPU chip (default env platform). Shapes are the published
EHAM->LIMC workload: batch 32, 4 channels, L=4633, hid_dim 128, LF/HF
codebooks of 32 (BASELINE.md). Prints one JSON line.

vs_baseline: the reference publishes no wall-clock numbers (BASELINE.md —
"Throughput: not published"). We normalize against an estimated 10 steps/s
for the reference PyTorch Lightning single-GPU trainer on this model size
(conservative; to be replaced if a measured reference number materializes).
"""

import json
import time

import numpy as np

BASELINE_STEPS_PER_SEC = 10.0  # estimated reference single-GPU throughput


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from tvqvae_tpu.config import Config
    from tvqvae_tpu.models import Stage1Spec, init_stage1
    from tvqvae_tpu.train import make_stage1_train_step
    from tvqvae_tpu.train.stage1 import create_stage1_state
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
    dt = (time.time() - t0) / n

    value = 1.0 / dt
    print(json.dumps({
        "metric": "stage1_train_steps_per_sec",
        "value": round(value, 3),
        "unit": "steps/s (B=32, C=4, L=4633, published config, 1 chip)",
        "vs_baseline": round(value / BASELINE_STEPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
