"""bf16 inference mode for the frozen decode pipeline.

`TrainedModelSampler(compute_dtype="bfloat16")` runs the frozen conv stacks
in bf16 (generate/serve `--bf16`); the decode pipeline is HBM-bound like
training (PERF.md), so this halves its activation traffic. These tests pin
that bf16 decode stays numerically close to the fp32 decode with the SAME
parameters — the quality argument mirrors the end-to-end-validated bf16
training mode.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tvqvae_tpu.config import Config
from tvqvae_tpu.models import Stage1Spec, init_stage1
from tvqvae_tpu.models.maskgit import FrozenStage1, decode_tokens
from tvqvae_tpu.models.stage1 import Stage1Model
import pytest

# heavy big-compile/mesh tests: slow tier (round-5 fast-tier
# budget, VERDICT r4 next-6 — `make test` still runs them)
pytestmark = pytest.mark.slow



def _tiny_cfg():
    return Config.from_dict({
        "encoder": {"init_dim": 4, "hid_dim": 8, "n_resnet_blocks": 1,
                    "downsampled_width": {"lf": 4, "hf": 8}},
        "decoder": {"n_resnet_blocks": 1},
        "VQ-VAE": {"n_fft": 4, "codebook_sizes": {"lf": 8, "hf": 8}},
    })


def test_decode_tokens_bf16_close_to_fp32():
    cfg = _tiny_cfg()
    B, C, L = 2, 4, 64
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, C, L)),
                    jnp.float32)

    spec32 = Stage1Spec.from_config(cfg, L, C, compute_dtype="float32")
    model32, params, batch_stats, vq_l, vq_h = init_stage1(
        jax.random.key(0), spec32, x
    )
    frozen = FrozenStage1(params=params, batch_stats=batch_stats,
                          vq_l=vq_l, vq_h=vq_h)

    spec16 = Stage1Spec.from_config(cfg, L, C, compute_dtype="bfloat16",
                                    fast_bn=True)
    model16 = Stage1Model(spec16)  # same params, bf16 compute

    rng = np.random.default_rng(1)
    for band, n_tok, k in (("lf", spec32.tokens_l, 8),
                           ("hf", spec32.tokens_h, 8)):
        s = jnp.asarray(rng.integers(0, k, size=(B, n_tok)), jnp.int32)
        y32 = np.asarray(decode_tokens(model32, frozen, s, band))
        y16 = np.asarray(decode_tokens(model16, frozen, s, band))
        assert y16.dtype == np.float32  # decoder output stays fp32
        scale = max(np.abs(y32).max(), 1e-3)
        assert np.max(np.abs(y16 - y32)) / scale < 0.06, (
            band, float(np.max(np.abs(y16 - y32)) / scale))
