"""tvqvae_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for synthetic
aircraft-trajectory generation.

Re-designed from scratch with the capabilities of SynthAIr/T-VQ-VAE-TrajGen
(reference at /root/reference): a three-stage TimeVQVAE generative pipeline
(time-frequency VQ-VAE -> MaskGIT bidirectional-transformer prior -> 1-D U-Net
fidelity enhancer), ADS-B preprocessing, FCN/ROCKET-based FID/IS evaluation,
TSGBench statistical metrics, and BlueSky flyability scoring.

The compute path is idiomatic JAX: STFT implemented as fused convolutions,
vector quantization with an explicit functional codebook state (Pallas kernel
for the fused distance/assign/EMA-stats hot loop), `lax.scan` iterative
decoding, GSPMD data parallelism over a `jax.sharding.Mesh`, Orbax
checkpoints.
"""

__version__ = "0.1.0"
