"""Trained-model sampler: checkpoints -> batched on-device generation.

Reference: timevqvae/generation/sampler.py:27-481 (TrainedModelSampler) and
utils/sample_utils.py:5-88 (batched unconditional/conditional loops). The
reference reconstructs whole Lightning modules to fish out subnetworks
(sampler.py:76-108); here each stage loads from its Orbax checkpoint and the
entire per-batch pipeline —

    MaskGIT iterative decoding (lax.scan) -> codebook lookup -> frozen
    stage-1 decoders -> LF+HF sum -> optional fidelity enhancer

— is ONE jitted function, so generation is a single device program per
batch instead of the reference's per-step Python loop (hot loop #2,
SURVEY.md §3). Evaluation helpers (feature extraction for generated /
reconstructed / SVQ round-trip sets, FID/IS/stat metrics, PCA/t-SNE plots)
mirror reference sampler.py:194-481.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tvqvae_tpu.config import Config
from tvqvae_tpu.models.fidelity_enhancer import FidelityEnhancer
from tvqvae_tpu.models.maskgit import (
    MaskGITSpec,
    build_transformers,
    decode_tokens,
    encode_tokens,
)
from tvqvae_tpu.train.runner import load_stage1_bundle
from tvqvae_tpu.utils.checkpoint import load_checkpoint


class TrainedModelSampler:
    def __init__(
        self,
        cfg: Config,
        stage1_ckpt: str,
        stage2_ckpt: str,
        stage3_ckpt: Optional[str] = None,
        use_fidelity_enhancer: bool = False,
        batch_size: int = 32,
        mesh=None,
        compute_dtype: str = "float32",
        fast_bn: bool = False,
        bf16_head: bool = True,
        bf16_istft: bool = True,
    ):
        """`mesh`: optional jax.sharding.Mesh — generation fans out over its
        `data` axis (batch_size must divide by the mesh size).
        `compute_dtype="bfloat16"` runs the frozen conv stacks (and the FE
        U-Net) in bf16 — the decode pipeline is HBM-bound like training, so
        this halves its activation traffic; params stay fp32. Under bf16,
        `bf16_head`/`bf16_istft` (both default ON, decode-side only,
        quality-gated on the L=512 ladder — PERF.md round-5) also run the
        TimeHead matmuls and the iSTFT overlap-add in bf16; both are no-ops
        when compute_dtype is float32."""
        self.cfg = cfg
        self.batch_size = batch_size
        self.use_fe = use_fidelity_enhancer
        self.mesh = mesh
        self.compute_dtype = compute_dtype

        self.stage1_model, self.frozen, self.s1_spec, meta = (
            load_stage1_bundle(cfg, stage1_ckpt,
                               compute_dtype=compute_dtype, fast_bn=fast_bn,
                               bf16_head=bf16_head, bf16_istft=bf16_istft)
        )
        self.input_length = int(meta["input_length"])
        self.in_channels = int(meta["in_channels"])
        self.n_classes = int(meta["n_classes"])

        tree2, meta2 = load_checkpoint(stage2_ckpt)
        self.mg_spec = MaskGITSpec.from_config(cfg, self.s1_spec)
        self.t_l, self.t_h = build_transformers(
            cfg, self.s1_spec, self.n_classes,
            # imported reference priors carry trained square project_in/out
            # Linears (meta flag written by import_ckpt --stage2_ckpt)
            force_projections=bool((meta2 or {}).get("force_projections")),
        )
        self._prior_params = tree2["params"]
        self._prior_stats = tree2.get("h_stats", {})

        self.fe = None
        self._fe_params = None
        self.tau = 0.0
        if stage3_ckpt is not None:
            tree3, _ = load_checkpoint(stage3_ckpt)
            self.fe = FidelityEnhancer(
                input_length=self.input_length,
                in_channels=self.in_channels,
                dim=cfg.fidelity_enhancer.dim,
                dim_mults=tuple(cfg.fidelity_enhancer.dim_mults),
                resnet_block_groups=cfg.fidelity_enhancer.resnet_block_groups,
                dropout=cfg.fidelity_enhancer.dropout,
                compute_dtype=compute_dtype,
                fast_norm=fast_bn,
            )
            self._fe_params = tree3["params"]
            self.tau = float(np.asarray(tree3.get("tau", 0.0)))
        elif use_fidelity_enhancer:
            raise ValueError("use_fidelity_enhancer=True needs stage3_ckpt")

        # All parameter trees are jit ARGUMENTS, never closures: closed-over
        # trees are baked into the HLO as constants (hundreds of MB for the
        # frozen stage-1 bundle), which blows up compilation payloads.
        #
        # They must also be DEVICE-RESIDENT: Orbax restore returns numpy
        # trees, and a numpy leaf passed as a jit argument is re-uploaded
        # host->device on EVERY call. That turned each generation batch into
        # a full parameter upload (measured 11.4 s/32-batch through this
        # environment's ~0.7 MB/s relay vs 48 ms/256-batch for the device
        # program itself — PERF.md "Trained-sampler path"). Upload once here;
        # under a mesh, replicate (a committed single-device array cannot
        # feed a multi-device pjit).
        if mesh is not None:
            from tvqvae_tpu.parallel import replicate_tree

            _put = lambda t: replicate_tree(mesh, t)  # noqa: E731
        else:
            _put = jax.device_put
        self.frozen = _put(self.frozen)
        self._prior_params = _put(self._prior_params)
        self._prior_stats = _put(self._prior_stats)
        if self._fe_params is not None:
            self._fe_params = _put(self._fe_params)

        from tvqvae_tpu.train.stage2 import make_sampling_fn

        self._sample_tokens = make_sampling_fn(
            self.stage1_model, self.t_l, self.t_h, self.mg_spec, mesh=mesh
        )
        self._fe_apply = (
            jax.jit(lambda p, x: self.fe.apply({"params": p}, x, False))
            if self.fe is not None else None
        )
        self._encode_jit = jax.jit(
            self._encode_impl, static_argnames=("svq_temp",)
        )
        self._decode_jit = jax.jit(self._decode_impl)

        # ESS path (reference maskgit.py:479-679; off unless configured).
        # One jitted device program per batch, like the default sampler —
        # the retraction loop is a lax.scan inside (no host round-trips).
        self.use_ess = bool(cfg.maskgit.ess_use)
        self._ess_rate = float(cfg.maskgit.ess_error_ratio_ma_rate)
        if self.use_ess:
            from tvqvae_tpu.train.stage2 import make_ess_sampling_fn

            self._ess_sample = make_ess_sampling_fn(
                self.stage1_model, self.t_l, self.t_h, self.mg_spec,
                self._ess_rate,
            )

    # ------------------------------------------------------------------

    def _encode_impl(self, frozen, x, r1, r2, svq_temp):
        s_l = encode_tokens(
            self.stage1_model, frozen, x, "lf", svq_temp=svq_temp, rng=r1
        )
        s_h = encode_tokens(
            self.stage1_model, frozen, x, "hf", svq_temp=svq_temp, rng=r2
        )
        return s_l, s_h

    def _decode_impl(self, frozen, s_l, s_h):
        x_l = decode_tokens(self.stage1_model, frozen, s_l, "lf")
        x_h = decode_tokens(self.stage1_model, frozen, s_h, "hf")
        return x_l + x_h

    def _sample_batch(self, rng, num: int, class_index: Optional[int]):
        if self.use_ess:
            x_l, x_h, x = self._ess_sample(
                self.frozen, self._prior_params, self._prior_stats, rng, num,
                class_index,
            )
        else:
            x_l, x_h, x = self._sample_tokens(
                self.frozen, self._prior_params, self._prior_stats, rng, num,
                class_index,
            )
        if self.use_fe:
            x = self._fe_apply(self._fe_params, x)
        return x_l, x_h, x

    def sample(
        self,
        n_samples: int,
        kind: str = "unconditional",
        class_index: Optional[int] = None,
        batch_size: Optional[int] = None,
        seed: int = 0,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Batched sampling (reference sample_utils.py:5-88 +
        sampler.py:140-169). Returns (x_l, x_h, x) host arrays."""
        assert kind in ("unconditional", "conditional")
        if kind == "conditional":
            assert class_index is not None
        else:
            class_index = None
        bs = batch_size or self.batch_size
        rng = jax.random.key(seed)
        outs_l, outs_h, outs = [], [], []
        done = 0
        while done < n_samples:
            b = min(bs, n_samples - done)
            rng, r = jax.random.split(rng)
            x_l, x_h, x = self._sample_batch(r, bs, class_index)
            outs_l.append(np.asarray(x_l[:b]))
            outs_h.append(np.asarray(x_h[:b]))
            outs.append(np.asarray(x[:b]))
            done += b
        return (
            np.concatenate(outs_l),
            np.concatenate(outs_h),
            np.concatenate(outs),
        )

    # ------------------------------------------------------------------
    # evaluation-time reconstruction sets (reference sampler.py:194-276)

    def reconstruct(
        self, x: np.ndarray, svq_temp: Optional[float] = None, seed: int = 0
    ) -> np.ndarray:
        """Stage-1 round trip: encode (optionally SVQ-stochastic) + decode.
        svq_temp=None/0 -> deterministic argmax (compute_z_rec path);
        svq_temp>0 -> stochastic (compute_z_svq path)."""
        temp = svq_temp if svq_temp else None
        rng = jax.random.key(seed)
        outs = []
        bs = self.batch_size
        for s in range(0, x.shape[0], bs):
            xb = x[s:s + bs]
            pad = bs - xb.shape[0] if xb.shape[0] < bs and x.shape[0] > bs else 0
            if pad:
                xb = np.concatenate([xb, xb[:1].repeat(pad, axis=0)])
            xb = jnp.asarray(xb, jnp.float32)
            rng, r1, r2 = jax.random.split(rng, 3)
            s_l, s_h = self._encode_jit(self.frozen, xb, r1, r2, temp)
            out = np.asarray(self._decode_jit(self.frozen, s_l, s_h))
            outs.append(out[: out.shape[0] - pad] if pad else out)
        return np.concatenate(outs)

    def enhance(self, x: np.ndarray) -> np.ndarray:
        """Apply the fidelity enhancer to host samples in batches."""
        assert self.fe is not None and self._fe_params is not None
        outs = []
        bs = self.batch_size
        for s in range(0, x.shape[0], bs):
            xb = x[s:s + bs]
            pad = bs - xb.shape[0] if xb.shape[0] < bs and x.shape[0] > bs else 0
            if pad:
                xb = np.concatenate([xb, xb[:1].repeat(pad, axis=0)])
            out = np.asarray(
                self._fe_apply(self._fe_params, jnp.asarray(xb, jnp.float32))
            )
            outs.append(out[: out.shape[0] - pad] if pad else out)
        return np.concatenate(outs)


def search_optimal_tau(
    cfg: Config,
    sampler: TrainedModelSampler,
    metrics,
    X_train: np.ndarray,
    n_samples: int = 1024,
    tau_search_rng=None,
    seed: int = 0,
) -> float:
    """FID-matching search for the SVQ temperature (reference
    stage3.py:86-167 — defined there but never called by any entry point;
    exposed here behind the train CLI's --search_tau flag)."""
    taus = list(tau_search_rng or cfg.fidelity_enhancer.tau_search_rng)
    _, _, xhat = sampler.sample(n_samples, "unconditional", seed=seed)
    z_hat = metrics.compute_z(xhat)

    fids = []
    for tau in taus:
        xprime = sampler.reconstruct(X_train, svq_temp=float(tau), seed=seed)
        z_prime = metrics.compute_z(xprime)
        fid = metrics.fid_score(z_hat, z_prime)
        fids.append(float(fid))
        print(f"[tau-search] tau={tau} fid={fid:.4f}")
    best = taus[int(np.argmin(fids))]
    print(f"[tau-search] optimal tau = {best}")
    return float(best)
