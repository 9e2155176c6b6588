"""Snake activation: x + (1/a) * sin^2(a * x).

Functional core of the reference's TorchScript SnakeActivation
(timevqvae/utils/train_utils.py:421-448). The learnable per-channel ``a`` is
owned by the calling flax module; here is just the fused elementwise op,
which XLA folds into adjacent convolutions.
"""

import jax.numpy as jnp


def snake(x: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """``a`` broadcasts against ``x`` (per-channel shape like (1, C, 1, 1))."""
    s = jnp.sin(a * x)
    return x + (s * s) / a
