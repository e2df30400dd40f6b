"""multimodal_pl_tpu — TPU-native multimodal partial-label 3D segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
multimodal-PL codebase (multimodal partially-labeled abdominal organ
segmentation on AMOS CT+MRI):

- residual 3D U-Net with weight-standardized convs, GroupNorm, class-token
  cross-attention (EAM) and deep supervision  (models/)
- partial-label machinery: organ atlas prior, refiner pseudo-labeler,
  modality discriminator, masked marginal Dice/CE losses  (losses/, train/)
- batched sliding-window full-volume inference with Gaussian blending (infer/)
- NIfTI data pipeline with intensity windowing and augmentation (data/)
- SPMD data/spatial parallelism over jax.sharding meshes (parallel/)
- Pallas TPU kernels for the hot fused ops (ops/pallas/)

Everything runs channels-last (N, D, H, W, C) — the layout XLA tiles best on
the TPU MXU — and every step is a pure function compiled once under jit.
"""

__version__ = "0.1.0"
