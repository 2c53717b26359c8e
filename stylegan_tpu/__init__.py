"""stylegan_tpu — a TPU-native (JAX/XLA/Pallas/pjit) StyleGAN framework.

A from-scratch rebuild of the capabilities of huangzh13/StyleGAN.pytorch
(progressive-growing StyleGAN1: equalized LR, PixelNorm, minibatch stddev,
style mixing, truncation trick, EMA, official-TF-weight import) designed for
TPU: NHWC/MXU-friendly compute, per-depth jitted train steps, shard_map data
parallelism over a device mesh, and Pallas kernels for the bandwidth-bound
epilogues.
"""

__version__ = "0.1.0"
