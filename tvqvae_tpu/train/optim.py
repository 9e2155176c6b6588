"""AdamW with configurable moment-STORAGE dtypes — an HBM-traffic lever.

The stage-1 step is memory-bound and its top HBM consumer is the AdamW
state sweep (PERF.md "Roofline gap: bounded": 181.4M fp32 params x
~28 B/param of read/write per step; the top HLO instructions are the
optimizer `multiply_add_fusion`s). optax's `adamw` exposes `mu_dtype`
(chip-measured +2.4% steps/s as `--bf16_mu`) but pins the second moment
to fp32. This module adds the symmetric `nu_dtype` knob.

Numerics: all update ARITHMETIC stays in the gradient dtype (fp32 here) —
stored bf16 moments are upcast by dtype promotion inside the moment
update, and only the carried state is cast down (exactly how optax
handles `mu_dtype`). The precision-sensitive part of bf16 nu is the
rsqrt denominator: bf16's ~8 mantissa bits put ~0.4% relative noise on
per-parameter step sizes. Whether that matters is an empirical question —
gated by the same L=512 quality ladder as every other lever
(tools/quality_run.py --bf16_nu).

Reference parity note: the reference trains with torch.optim.AdamW
(fp32 state; reference timevqvae/trainers/stage1.py:229-236). Both knobs
default OFF, so the default optimizer remains exact-parity optax.adamw.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax


def scale_by_adam_storage(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    eps_root: float = 0.0,
    mu_dtype: Optional[Any] = None,
    nu_dtype: Optional[Any] = None,
) -> optax.GradientTransformation:
    """`optax.scale_by_adam` (optax 0.2.6 semantics) plus a `nu_dtype`
    storage cast. With `nu_dtype=None` this is step-for-step identical to
    optax's transform (same moment updates, bias correction, and state
    pytree — `optax.ScaleByAdamState`), so checkpoints are isomorphic
    across the flag."""

    def init_fn(params):
        mu = optax.tree.zeros_like(params, dtype=mu_dtype)
        nu = optax.tree.zeros_like(params, dtype=nu_dtype)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu
        )

    def update_fn(updates, state, params=None):
        del params
        # dtype promotion upcasts bf16-stored moments against fp32 grads,
        # so the EMA arithmetic runs in fp32 either way
        mu = optax.tree.update_moment(updates, state.mu, b1, 1)
        nu = optax.tree.update_moment_per_elem_norm(updates, state.nu, b2, 2)
        count_inc = optax.safe_increment(state.count)
        mu_hat = optax.tree.bias_correction(mu, b1, count_inc)
        nu_hat = optax.tree.bias_correction(nu, b2, count_inc)
        new_updates = jax.tree.map(
            lambda m, v: m / (jnp.sqrt(v + eps_root) + eps), mu_hat, nu_hat
        )
        mu = optax.tree.cast(mu, mu_dtype)
        nu = optax.tree.cast(nu, nu_dtype)
        return new_updates, optax.ScaleByAdamState(
            count=count_inc, mu=mu, nu=nu
        )

    return optax.GradientTransformation(init_fn, update_fn)


def adamw(
    learning_rate,
    weight_decay: float = 0.01,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype: Optional[Any] = None,
    nu_dtype: Optional[Any] = None,
) -> optax.GradientTransformation:
    """AdamW with independent first/second-moment storage dtypes.

    `nu_dtype=None` delegates to `optax.adamw` verbatim (bitwise-identical
    update math and state); a non-None `nu_dtype` swaps in
    `scale_by_adam_storage` inside the same decoupled-weight-decay chain
    that `optax.adamw` builds (scale_by_adam -> add_decayed_weights ->
    scale_by_learning_rate)."""
    if nu_dtype is None:
        return optax.adamw(
            learning_rate, b1=b1, b2=b2, eps=eps,
            weight_decay=weight_decay, mu_dtype=mu_dtype,
        )
    return optax.chain(
        scale_by_adam_storage(
            b1=b1, b2=b2, eps=eps, mu_dtype=mu_dtype, nu_dtype=nu_dtype
        ),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )
