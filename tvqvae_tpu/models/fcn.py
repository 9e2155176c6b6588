"""FCN time-series classifier (the FID/IS "Inception" feature network).

Reference: timevqvae/models/fcn.py:11-101 — three Conv1d("same")+BN+ReLU
blocks (128/256/128 channels, kernels 8/5/3) with global average pooling;
`features=True` returns the 128-d GAP vector used for FID features.
Channel-last layout; for stride-1 convs flax 'SAME' padding reproduces the
reference's TF-style same-padding exactly.
"""

import jax.numpy as jnp
from flax import linen as nn

from .layers import batch_norm


class FCN(nn.Module):
    n_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False, features: bool = False):
        """x: (B, C, L) channel-first (reference convention)."""
        h = jnp.transpose(x, (0, 2, 1))  # (B, L, C)
        for ch, k in [(128, 8), (256, 5), (128, 3)]:
            h = nn.Conv(ch, (k,), padding="SAME")(h)
            h = batch_norm(train)(h)
            h = nn.relu(h)
        h = h.mean(axis=1)  # GAP over time -> (B, 128)
        if features:
            return h
        return nn.Dense(self.n_classes)(h)
