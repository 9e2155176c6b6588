"""1-D resampling along the last axis with torch-matching semantics.

The reference uses ``F.interpolate(mode='linear', align_corners=False)`` /
``nn.Upsample(mode='linear')`` (half-pixel sampling) and
``F.interpolate(mode='nearest')`` (floor index) in several places
(timevqvae/models/vq_vae.py:254,262; bidirectional_transformer.py:27;
fidelity_enhancer.py:444-459,492; trainers/stage1.py:103-113). These are the
exact formulas, implemented as gathers + weighted sums that XLA vectorizes on
the VPU.
"""

import jax.numpy as jnp


def interp_linear(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Linear resize of (..., L) to (..., size), align_corners=False.

    Matches torch F.interpolate(mode='linear', align_corners=False): sample
    positions are half-pixel centers, clamped at the borders.
    """
    L = x.shape[-1]
    if size == L:
        return x
    scale = L / size
    pos = (jnp.arange(size, dtype=jnp.float32) + 0.5) * scale - 0.5
    pos = jnp.clip(pos, 0.0, L - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, L - 1)
    frac = (pos - lo).astype(x.dtype)
    return x[..., lo] * (1.0 - frac) + x[..., hi] * frac


def interp_nearest(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Nearest resize of (..., L) to (..., size).

    Matches torch F.interpolate(mode='nearest'): index = floor(i * L / size).
    """
    L = x.shape[-1]
    if size == L:
        return x
    idx = jnp.floor(jnp.arange(size, dtype=jnp.float32) * (L / size)).astype(
        jnp.int32
    )
    idx = jnp.clip(idx, 0, L - 1)
    return x[..., idx]
