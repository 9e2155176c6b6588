"""Measure the reference's stage-1 training step (its own torch code, via
tools/refshim.py) and this repo's JAX stage-1 step on the SAME host CPU, at
the published EHAM->LIMC shapes (B=32, C=4, L=4633; configs/config.yaml).

This grounds bench.py's `vs_baseline`: the reference publishes no wall-clock
numbers (BASELINE.md), so the anchor is a same-machine, same-shape CPU
measurement of the reference's own Stage1.training_step + backward + AdamW
(reference trainers/stage1.py:171-198, scripts/train.py:109-113), compared
apples-to-apples against this repo's jitted stage-1 step on the same CPU.

Usage:
  python tools/measure_reference.py --what ref-stage1   [--steps 5 --batch 32 --length 4633]
  python tools/measure_reference.py --what jax-stage1   [--steps 30 ...]

Each prints one JSON line. Run the two in separate processes (the jax mode
forces the CPU platform before backend init).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def measure_ref_stage1(batch, length, channels, steps, warmup):
    import refshim

    refshim.install()

    import torch
    import yaml

    from timevqvae.trainers import Stage1

    with open(os.path.join(refshim.REFERENCE_ROOT, "configs/config.yaml")) as f:
        cfg = yaml.safe_load(f)

    torch.manual_seed(0)
    model = Stage1(input_length=length, in_channels=channels, config=cfg)
    model.train()
    opt_cfg = model.configure_optimizers()
    opt = opt_cfg["optimizer"]
    model._shim_scheduler = opt_cfg["lr_scheduler"]

    x = torch.randn(batch, channels, length)
    y = torch.zeros(batch, dtype=torch.long)
    b = (x, y)

    def one_step():
        out = model.training_step(b, 1)
        opt.zero_grad(set_to_none=True)
        out["loss"].backward()
        opt.step()

    for _ in range(warmup):
        one_step()
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    dt = time.perf_counter() - t0
    return {
        "what": "reference_stage1_train_step",
        "impl": "torch-cpu (reference code via refshim)",
        "torch_threads": __import__("torch").get_num_threads(),
        "batch": batch, "length": length, "channels": channels,
        "steps_timed": steps,
        "sec_per_step": round(dt / steps, 4),
        "steps_per_sec": round(steps / dt, 4),
    }


def measure_jax_stage1(batch, length, channels, steps, warmup):
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np
    import optax

    from tvqvae_tpu.config import Config
    from tvqvae_tpu.models import Stage1Spec, init_stage1
    from tvqvae_tpu.train import make_stage1_train_step
    from tvqvae_tpu.train.stage1 import create_stage1_state
    from tvqvae_tpu.utils import warmup_cosine_schedule

    cfg = Config()
    spec = Stage1Spec.from_config(cfg, length, channels)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, channels, length)),
        jnp.float32,
    )
    model, params, batch_stats, vq_l, vq_h = init_stage1(
        jax.random.key(0), spec, x
    )
    tx = optax.adamw(warmup_cosine_schedule(1e-3, 50000), weight_decay=0.01)
    state = create_stage1_state(params, batch_stats, vq_l, vq_h, tx)
    step = jax.jit(make_stage1_train_step(model, tx), donate_argnums=0)
    rng = jax.random.key(1)

    for _ in range(max(warmup, 1)):
        state, m = step(state, x, rng)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, x, rng)
    jax.block_until_ready(m)
    dt = time.perf_counter() - t0
    return {
        "what": "repo_stage1_train_step",
        "impl": f"jax-{jax.devices()[0].platform}",
        "batch": batch, "length": length, "channels": channels,
        "steps_timed": steps,
        "sec_per_step": round(dt / steps, 4),
        "steps_per_sec": round(steps / dt, 4),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--what", choices=["ref-stage1", "jax-stage1"], required=True)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--length", type=int, default=4633)
    p.add_argument("--channels", type=int, default=4)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--warmup", type=int, default=None)
    a = p.parse_args()
    if a.what == "ref-stage1":
        out = measure_ref_stage1(
            a.batch, a.length, a.channels,
            a.steps or 5, a.warmup if a.warmup is not None else 2,
        )
    else:
        out = measure_jax_stage1(
            a.batch, a.length, a.channels,
            a.steps or 30, a.warmup if a.warmup is not None else 3,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
