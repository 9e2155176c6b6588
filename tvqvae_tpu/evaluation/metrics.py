"""Metrics engine: FID / IS / TSGBench stats with cached data features.

Reference: timevqvae/evaluation/metrics.py:50-214. The featurizer is either
the ROCKET bank (jitted on TPU, evaluation/rocket.py) or the supervised FCN
(models/fcn.py with a trained checkpoint); train/test feature matrices are
computed once at construction (reference :98-99) and reused by every FID
call during validation and evaluation.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tvqvae_tpu.models.fcn import FCN
from .eval_utils import calculate_fid, calculate_inception_score, remove_outliers
from .rocket import RocketKernels, apply_kernels, generate_kernels
from .stat_metrics import (
    auto_correlation_difference,
    kurtosis_difference,
    marginal_distribution_difference,
    skewness_difference,
)


class Metrics:
    def __init__(
        self,
        input_length: int,
        in_channels: int,
        n_classes: int,
        batch_size: int,
        X_train: np.ndarray,
        X_test: np.ndarray,
        feature_extractor_type: str = "rocket",
        fcn_variables: Optional[dict] = None,
        rocket_num_kernels: int = 1000,
        fid_method: str = "schur",
    ):
        self.feature_extractor_type = feature_extractor_type
        self.fid_method = fid_method
        self.batch_size = batch_size
        self.n_classes = n_classes
        self.X_train = np.asarray(X_train)
        self.X_test = np.asarray(X_test)

        self._fcn = None
        self._fcn_vars = None
        if feature_extractor_type == "supervised_fcn":
            assert fcn_variables is not None, "FCN features need a checkpoint"
            self._fcn = FCN(n_classes=n_classes)
            # device_put: numpy leaves closed over by a jitted fn are baked
            # into the HLO as literals (payload blowup through the remote
            # compiler) — device arrays are threaded as buffers instead.
            self._fcn_vars = jax.device_put(fcn_variables)
            self._fcn_apply = jax.jit(
                lambda x: self._fcn.apply(self._fcn_vars, x, False, features=True)
            )
            self._fcn_logits = jax.jit(
                lambda x: self._fcn.apply(self._fcn_vars, x, False)
            )
        elif feature_extractor_type == "rocket":
            self.rocket_kernels: RocketKernels = generate_kernels(
                self.X_train.shape[-1], num_kernels=rocket_num_kernels
            )
        else:
            raise ValueError(feature_extractor_type)

        self.z_train = self.compute_z(self.X_train)
        self.z_test = self.compute_z(self.X_test)

    # ------------------------------------------------------------------

    def extract_feature_representations(self, x: np.ndarray) -> np.ndarray:
        """(B, C, L) -> (B, D) features (reference metrics.py:107-127)."""
        if self.feature_extractor_type == "supervised_fcn":
            return np.asarray(self._fcn_apply(jnp.asarray(x, jnp.float32)))
        z = apply_kernels(
            np.asarray(x)[:, 0, :].astype(np.float64), self.rocket_kernels
        )
        norm = np.maximum(np.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
        return (z / norm).astype(np.float32)

    def compute_z(self, x: np.ndarray) -> np.ndarray:
        zs = []
        for s in range(0, x.shape[0], self.batch_size):
            zs.append(self.extract_feature_representations(x[s:s + self.batch_size]))
        return np.concatenate(zs, axis=0)

    def z_gen_fn(self, x_gen: np.ndarray) -> np.ndarray:
        return self.compute_z(x_gen)

    # ------------------------------------------------------------------

    def fid_score(
        self, z1: np.ndarray, z2: np.ndarray, method: Optional[str] = None
    ) -> float:
        """Outlier-filtered FID (reference :175-178). `method` overrides the
        instance default ("schur" = reference-exact scipy sqrtm; "svd" =
        exact trace identity, ~50x faster at eval shapes — eval_utils)."""
        return calculate_fid(
            remove_outliers(z1), remove_outliers(z2),
            method=method or self.fid_method,
        )

    def inception_score(self, x_gen: np.ndarray, n_split: int = 5):
        assert self._fcn is not None, "IS needs the supervised FCN"
        ps = []
        for s in range(0, x_gen.shape[0], self.batch_size):
            logits = self._fcn_logits(
                jnp.asarray(x_gen[s:s + self.batch_size], jnp.float32)
            )
            ps.append(np.asarray(jax.nn.softmax(logits, axis=-1)))
        return calculate_inception_score(np.concatenate(ps), n_split=n_split)

    def stat_metrics(
        self, x_real: np.ndarray, x_gen: np.ndarray
    ) -> Tuple[float, float, float, float]:
        mdd = marginal_distribution_difference(x_real, x_gen)
        acd = auto_correlation_difference(x_real, x_gen)
        sd = skewness_difference(x_real, x_gen)
        kd = kurtosis_difference(x_real, x_gen)
        return mdd, acd, sd, kd
