"""Learning-rate schedule: linear warmup then cosine annealing.

Matches the reference linear_warmup_cosine_annealingLR
(timevqvae/utils/train_utils.py:451-483): warmup over
``linear_warmup_rate * max_steps`` steps from 0 to ``lr``, then cosine decay
reaching ``min_lr`` exactly at ``max_steps``.
"""

import optax


def warmup_cosine_schedule(
    lr: float,
    max_steps: int,
    linear_warmup_rate: float = 0.1,
    min_lr: float = 1e-6,
) -> optax.Schedule:
    assert 0.0 < linear_warmup_rate < 1.0, "0 < linear_warmup_rate < 1."
    warmup_steps = int(max_steps * linear_warmup_rate)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=lr,
        warmup_steps=warmup_steps,
        decay_steps=max_steps,
        end_value=min_lr,
    )
