"""Worker for tests/test_multiprocess_spmd.py — NOT a pytest module.

Runs runner.train_stage1 under a REAL multi-process JAX runtime
(jax.distributed over localhost, CPU devices, Gloo collectives): the
process-sliced input feed (`make_batches(process_index/process_count)` +
`jax.make_array_from_process_local_data`), the cross-process gradient /
VQ-EMA reductions inside the jitted SPMD step, and the primary-host-gated
checkpoint writes all execute for real — the paths that single-process
tests can only mock. Dumps the final checkpoint's param/codebook tree to
an .npz so the parent test can assert cross-process-count equivalence.

Usage: python mp_stage1_worker.py <process_id> <num_processes> <port> <outdir>
"""

import sys


def main():
    pid, nproc, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)  # 2 local x N processes
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nproc,
            process_id=pid,
        )
    assert jax.process_count() == nproc, (jax.process_count(), nproc)

    import os

    import numpy as np

    from tvqvae_tpu.config import Config
    from tvqvae_tpu.data.dataset import DatasetSplits
    from tvqvae_tpu.train import runner

    # identical synthetic data in every process (host-identical shuffle
    # is the input-feed contract, dataset.py make_batches)
    rng = np.random.default_rng(7)
    X = rng.normal(size=(32, 2, 64)).astype(np.float32)
    y = rng.integers(0, 2, size=(32, 1)).astype(np.int64)
    data = DatasetSplits(
        X_train=X, y_train=y, X_test=X[:8], y_test=y[:8],
        scaler=None, n_classes=2,
    )

    cfg = Config.from_dict({
        "dataset": {"batch_sizes": {"stage1": 8}},
        "encoder": {
            "init_dim": 4, "hid_dim": 8, "n_resnet_blocks": 1,
            "downsampled_width": {"lf": 4, "hf": 8},
        },
        "decoder": {"n_resnet_blocks": 1},
        "VQ-VAE": {"n_fft": 4, "codebook_sizes": {"lf": 8, "hf": 8}},
        "trainer_params": {
            "max_steps": {"stage1": 6},
            "val_check_interval": {"stage1": 3},
        },
    })

    ckpt = os.path.join(outdir, f"np{nproc}", "stage1")
    # data_on_device=False pins BOTH arms to the host make_batches feed:
    # cross-process-count equivalence holds because make_batches' shuffle
    # RNG is host-identical — that host-path contract is what this test
    # asserts. The single-process DEFAULT is the device-resident feed,
    # whose batch order comes from a *device threefry* stream instead
    # (runner.device_epoch_indices; documented non-semantic deviation), so
    # leaving the default on would compare two different batch sequences.
    runner.train_stage1(cfg, data, ckpt, None, seed=0,
                        data_on_device=False)

    # every process restores the (primary-written) checkpoint: a non-primary
    # process reading it back IS the "restore anywhere" claim
    from tvqvae_tpu.utils.checkpoint import load_checkpoint

    tree, _ = load_checkpoint(ckpt)
    flat = {}
    import jax.tree_util as jtu

    for path, leaf in jtu.tree_leaves_with_path(tree):
        flat[jtu.keystr(path)] = np.asarray(leaf)

    # FUNCTIONAL fingerprint: eval-mode reconstruction of a fixed batch
    # through the restored checkpoint. Leaf-wise comparison alone is the
    # wrong metric for the BN-degenerate directions (pre-BN conv biases —
    # see the parent test's comment); the function the checkpoint computes
    # is the equivalence claim.
    from tvqvae_tpu.models import Stage1Spec
    from tvqvae_tpu.models.stage1 import Stage1Model
    from tvqvae_tpu.models.vq import CodebookState

    spec = Stage1Spec.from_config(cfg, X.shape[2], X.shape[1])
    model = Stage1Model(spec)
    variables = {"params": tree["params"],
                 "batch_stats": tree["batch_stats"]}
    # CONTINUOUS maps only: the full forward routes through the VQ argmin,
    # where a boundary token flip turns infinitesimal param drift into an
    # O(1) output jump — a discontinuity, not an inequivalence.
    z_l = model.apply(variables, X[:4], "lf", method=Stage1Model.encode)
    z_h = model.apply(variables, X[:4], "hf", method=Stage1Model.encode)
    flat["__eval_z_l__"] = np.asarray(z_l)
    flat["__eval_z_h__"] = np.asarray(z_h)
    zq_fix = np.random.default_rng(3).normal(
        size=np.asarray(z_l).shape
    ).astype(np.float32)
    dec = model.apply(variables, zq_fix, "lf", method=Stage1Model.decode)
    flat["__eval_dec_l__"] = np.asarray(dec)

    np.savez(os.path.join(outdir, f"final_np{nproc}_p{pid}.npz"), **flat)
    print(f"[worker p{pid}/{nproc}] done: {len(flat)} leaves", flush=True)


if __name__ == "__main__":
    main()
