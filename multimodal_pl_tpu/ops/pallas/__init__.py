"""Pallas TPU kernels for the hot fused ops.

The reference's compute ran on implicit cuDNN/cuBLAS kernels; here the conv
FLOPs belong to XLA's MXU convolutions, and Pallas covers the memory-bound
fusions XLA doesn't fully own:

- fused GroupNorm -> ReLU (two-pass, VMEM-blocked) — the pre-activation
  pattern appearing ~40x per U-Net forward.

Every kernel has an XLA fallback (`use_pallas=False` or non-TPU backends) and
is validated against it in interpret mode on CPU.
"""

from multimodal_pl_tpu.ops.pallas.fused_gn_relu import fused_group_norm_relu
