"""Low-/high-frequency band splitting on time-frequency maps.

Reference semantics: timevqvae/utils/train_utils.py:361-386. The frequency
axis (H) of a (B, C, H, W) time-frequency map is split into the LF band
(bin 0) and the HF band (bins 1:). Two modes:

  - copy=False ("target/zero" mode): the other band is zeroed out. Used to
    build per-band reconstruction targets and to clean decoder outputs.
  - copy=True ("input/copy" mode): the kept band is broadcast into the other
    band's bins so encoders see a full-height map. LF: bin 0 repeated across
    all H bins; HF: bins 1: kept and bin 1 duplicated into bin 0.

Pure indexing — XLA fuses these into neighbouring convs for free.
"""

import jax.numpy as jnp


def zero_pad_high_freq(xf: jnp.ndarray, copy: bool = False) -> jnp.ndarray:
    """Keep the LF band (frequency bin 0) of (B, C, H, W)."""
    if copy:
        return jnp.broadcast_to(xf[:, :, :1, :], xf.shape)
    return jnp.concatenate(
        [xf[:, :, :1, :], jnp.zeros_like(xf[:, :, 1:, :])], axis=2
    )


def zero_pad_low_freq(xf: jnp.ndarray, copy: bool = False) -> jnp.ndarray:
    """Keep the HF band (frequency bins 1:) of (B, C, H, W)."""
    if copy:
        return jnp.concatenate([xf[:, :, 1:2, :], xf[:, :, 1:, :]], axis=2)
    return jnp.concatenate(
        [jnp.zeros_like(xf[:, :, :1, :]), xf[:, :, 1:, :]], axis=2
    )
