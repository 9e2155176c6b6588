"""Differential parity tests against the reference's OWN code.

These import the reference implementation at /root/reference (via
tools/refshim.py, which stubs lightning/mlflow/numba/geo-libs so the numeric
modules run on CPU) and assert this repo's implementations produce the same
numbers on identical inputs:

  - ROCKET features: reference rocket_functions.generate/apply_kernels
    (pure-Python via the numba stub — exact, slow) vs tvqvae_tpu rocket.
  - FID / IS: reference eval_utils vs tvqvae_tpu.evaluation.eval_utils.
  - TSGBench stats: reference stat_metrics vs tvqvae_tpu stat_metrics.
  - IsolationForest outlier filter: reference train_utils.remove_outliers.
  - VQ codebook: one EMA training step of the reference EuclideanCodebook
    vs tvqvae_tpu.models.vq.vq_forward, bit-comparable state.
  - band split, Snake, downsample-rate math, warmup-cosine LR schedule.

Everything skips cleanly when /root/reference or torch is absent.
"""

import os
import sys

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
sys.path.insert(0, os.path.abspath(TOOLS))

torch = pytest.importorskip("torch")

import refshim  # noqa: E402

if not refshim.reference_available():
    pytest.skip("/root/reference not present", allow_module_level=True)


@pytest.fixture(scope="module", autouse=True)
def _reference_stubs():
    """Install the dependency stubs for this module only and remove them
    afterwards — pytest imports every test module at collection time, so a
    module-level install() would leak the fake `traffic`/`cartopy` into
    other tests that feature-gate on those imports."""
    installed = refshim.install()
    # numpy 2 removed np.NINF, which the reference's apply_kernel uses
    had_ninf = hasattr(np, "NINF")
    if not had_ninf:
        np.NINF = -np.inf
    yield
    refshim.uninstall(installed)
    if not had_ninf:
        del np.NINF


# ---------------------------------------------------------------------------
# ROCKET


def test_rocket_features_match_reference():
    from timevqvae.evaluation import rocket_functions as ref_rocket

    from tvqvae_tpu.evaluation.rocket import RocketKernels, apply_kernels

    L, K, B = 100, 40, 6
    np.random.seed(7)
    w_flat, lengths, biases, dilations, paddings = ref_rocket.generate_kernels(
        L, K
    )
    X = np.random.default_rng(1).normal(size=(B, L)).astype(np.float64)
    ref_feats = ref_rocket.apply_kernels(X, (w_flat, lengths, biases, dilations, paddings))

    # convert the reference's flat kernel bank to this repo's padded layout
    max_len = int(lengths.max())
    w_pad = np.zeros((K, max_len), np.float32)
    a = 0
    for i in range(K):
        w_pad[i, : lengths[i]] = w_flat[a : a + lengths[i]]
        a += lengths[i]
    mine = apply_kernels(
        X,
        RocketKernels(
            weights=w_pad,
            lengths=lengths.astype(np.int32),
            biases=biases.astype(np.float32),
            dilations=dilations.astype(np.int32),
            paddings=paddings.astype(np.int32),
            input_length=L,
        ),
    )
    np.testing.assert_allclose(mine, ref_feats, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# FID / IS / outlier filter


def test_fid_matches_reference():
    from timevqvae.evaluation import eval_utils as ref_eval

    from tvqvae_tpu.evaluation.eval_utils import calculate_fid

    rng = np.random.default_rng(2)
    z1 = rng.normal(size=(300, 24))
    z2 = rng.normal(loc=0.3, size=(280, 24))
    ref = float(ref_eval.calculate_fid(z1, z2))
    mine = calculate_fid(z1, z2)
    assert abs(ref - mine) < 1e-8 * max(1.0, abs(ref))


def test_inception_score_matches_reference():
    from timevqvae.evaluation import eval_utils as ref_eval

    from tvqvae_tpu.evaluation.eval_utils import calculate_inception_score

    rng = np.random.default_rng(3)
    logits = rng.normal(size=(500, 5))
    p = np.exp(logits) / np.exp(logits).sum(axis=1, keepdims=True)
    ref_m, ref_s = ref_eval.calculate_inception_score(
        p.copy(), n_split=5, shuffle=False
    )
    m, s = calculate_inception_score(p.copy(), n_split=5, shuffle=False)
    assert abs(m - float(ref_m)) < 1e-10
    assert abs(s - float(ref_s)) < 1e-10


def test_outlier_filter_matches_reference():
    from timevqvae.utils import train_utils as ref_tu

    from tvqvae_tpu.evaluation.eval_utils import remove_outliers

    rng = np.random.default_rng(4)
    z = np.concatenate(
        [rng.normal(size=(200, 8)), rng.normal(loc=6.0, size=(10, 8))]
    )
    np.testing.assert_array_equal(remove_outliers(z), ref_tu.remove_outliers(z))


# ---------------------------------------------------------------------------
# TSGBench statistical metrics


def test_stat_metrics_match_reference():
    from timevqvae.evaluation import stat_metrics as ref_sm

    from tvqvae_tpu.evaluation import stat_metrics as my_sm

    rng = np.random.default_rng(5)
    real = rng.normal(size=(24, 4, 64))
    gen = rng.normal(loc=0.1, scale=1.2, size=(20, 4, 64))

    assert abs(
        my_sm.marginal_distribution_difference(real, gen)
        - float(ref_sm.marginal_distribution_difference(real, gen))
    ) < 1e-10
    assert abs(
        my_sm.auto_correlation_difference(real, gen)
        - float(ref_sm.auto_correlation_difference(real, gen))
    ) < 1e-8
    assert abs(
        my_sm.skewness_difference(real, gen)
        - float(ref_sm.skewness_difference(real, gen))
    ) < 1e-12
    assert abs(
        my_sm.kurtosis_difference(real, gen)
        - float(ref_sm.kurtosis_difference(real, gen))
    ) < 1e-12


# ---------------------------------------------------------------------------
# VQ codebook: one EMA training step, bit-comparable state


def test_vq_ema_step_matches_reference():
    import jax
    import jax.numpy as jnp

    from timevqvae.models.vq import EuclideanCodebook

    from tvqvae_tpu.models.vq import CodebookState, VQParams, vq_forward

    K, D, M = 8, 16, 64
    torch.manual_seed(0)
    ref_cb = EuclideanCodebook(
        dim=D, codebook_size=K, kmeans_init=False, decay=0.8, eps=1e-5,
        threshold_ema_dead_code=0,
    )
    ref_cb.train()

    embed0 = ref_cb.embed.detach().numpy().copy()
    x_np = np.random.default_rng(6).normal(size=(M, D)).astype(np.float32)

    ref_q, ref_ind = ref_cb(torch.from_numpy(x_np))

    state = CodebookState(
        embed=jnp.asarray(embed0),
        embed_avg=jnp.asarray(embed0),
        cluster_size=jnp.zeros((K,), jnp.float32),
        initted=jnp.asarray(True),
    )
    p = VQParams(codebook_size=K, dim=D, decay=0.8, eps=1e-5,
                 commitment_weight=1.0, threshold_ema_dead_code=0)
    out = vq_forward(state, jnp.asarray(x_np)[None], p, train=True,
                     rng=jax.random.key(0))

    np.testing.assert_array_equal(
        np.asarray(out.indices[0]), ref_ind.numpy().astype(np.int32)
    )
    np.testing.assert_allclose(
        np.asarray(out.quantized[0]), ref_q.detach().numpy(),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out.state.cluster_size), ref_cb.cluster_size.numpy(),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out.state.embed_avg), ref_cb.embed_avg.numpy(),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out.state.embed), ref_cb.embed.numpy(),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        float(out.perplexity), float(ref_cb.perplexity), rtol=1e-5
    )

    # commitment loss: mse(stop_grad(quantize), x) both sides (vq.py:362-366)
    ref_commit = torch.nn.functional.mse_loss(
        ref_q.detach(), torch.from_numpy(x_np)
    ).item()
    np.testing.assert_allclose(float(out.commit_loss), ref_commit, rtol=1e-5)


# ---------------------------------------------------------------------------
# band split / Snake / downsample rate / LR schedule


def test_band_split_matches_reference():
    from timevqvae.utils import train_utils as ref_tu

    from tvqvae_tpu.ops import zero_pad_high_freq, zero_pad_low_freq

    x = np.random.default_rng(8).normal(size=(2, 3, 3, 10)).astype(np.float32)
    xt = torch.from_numpy(x)
    for copy in (False, True):
        np.testing.assert_allclose(
            np.asarray(zero_pad_high_freq(x, copy=copy)),
            ref_tu.zero_pad_high_freq(xt, copy=copy).numpy(),
            rtol=0, atol=0,
        )
        np.testing.assert_allclose(
            np.asarray(zero_pad_low_freq(x, copy=copy)),
            ref_tu.zero_pad_low_freq(xt, copy=copy).numpy(),
            rtol=0, atol=0,
        )


def test_snake_matches_reference():
    from timevqvae.utils import train_utils as ref_tu

    from tvqvae_tpu.ops import snake

    act = ref_tu.SnakeActivation(num_features=5, dim=2)
    a = act.a.detach().numpy()  # (1, 5, 1, 1)
    x = np.random.default_rng(9).normal(size=(2, 5, 3, 7)).astype(np.float32)
    ref = act(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(snake(x, a)), ref, rtol=1e-6, atol=1e-6)


def test_downsample_rate_matches_reference():
    from timevqvae.utils import train_utils as ref_tu

    from tvqvae_tpu.ops import compute_downsample_rate

    for L in (64, 100, 512, 1024, 4633, 4634):
        for n_fft in (4, 8):
            for w in (4, 8, 32):
                assert compute_downsample_rate(L, n_fft, w) == ref_tu.compute_downsample_rate(L, n_fft, w), (L, n_fft, w)


def test_lr_schedule_matches_reference():
    from timevqvae.utils import train_utils as ref_tu

    from tvqvae_tpu.utils import warmup_cosine_schedule

    base_lr, max_steps = 1e-3, 200
    dummy = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([dummy], lr=base_lr)
    sched = ref_tu.linear_warmup_cosine_annealingLR(opt, max_steps, 0.1)
    mine = warmup_cosine_schedule(base_lr, max_steps, 0.1)

    ref_lrs = []
    for _ in range(max_steps):
        ref_lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    my_lrs = [float(mine(k)) for k in range(max_steps)]
    np.testing.assert_allclose(my_lrs, ref_lrs, rtol=1e-6, atol=1e-9)
