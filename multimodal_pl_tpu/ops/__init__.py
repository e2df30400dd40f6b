"""Core TPU-friendly ops: weight-standardized conv3d, group norm, resizes."""

from multimodal_pl_tpu.ops.conv import standardize_kernel, conv3d, ws_conv3d
from multimodal_pl_tpu.ops.norm import group_norm, layer_norm
from multimodal_pl_tpu.ops.resize import (
    upsample_trilinear,
    resize_trilinear,
    resize_nearest,
    downsample_nearest,
)
