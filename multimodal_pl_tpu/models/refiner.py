"""Lightweight refiner U-Net (reference unet3D_g, unet3D.py:1507-1623).

Turns (per-organ probability, atlas channel) pairs into binary pseudo-labels.
Runs at half resolution: a stride-2 stem conv (conv0 :1514) and a final x2
trilinear upsample of the logits (:1621). GroupNorm groups are 4 in the
residual stages (:1550, :1559), init_filter//2 in the fusion head (:1525) and
init_filter//4 in the classifier head (:1540).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from multimodal_pl_tpu.models.blocks import (
    GNReLUConv,
    GNReLUConvS2D,
    ResStage,
    ResStageS2D,
    WSConv3d,
    WSConv3dS2D,
)
from multimodal_pl_tpu.ops.resize import upsample_trilinear
from multimodal_pl_tpu.ops.s2d import (
    depth_to_space,
    depth_to_space_shifted,
    s2d_pack,
    s2d_upsample_trilinear,
    space_to_depth,
)


class RefinerUNet3D(nn.Module):
    """s2d=True (default) computes the full- AND half-resolution levels in
    the space-to-depth block domain; identical params and math
    (tests/test_s2d.py::test_refiner_s2d_parity).

    Layout rationale: the refiner's C=init_filter=24 stages pad the TPU
    128-lane minor dim 5.3x. The stride-2 stem enters from full-res aligned
    blocks; the half-res level (conv1, layer0, x1_resb, precls) then runs in
    ITS OWN block domain at 8*24=192 channels — the same encoder/x1-decoder
    pattern as UNet3DFEAM, one level down. Full-res s2d needs even input
    dims; the inner level additionally needs them divisible by 4 (falls back
    per-level otherwise).
    """

    layers: Sequence[int] = (1, 1, 1, 1, 1)
    num_classes: int = 2
    weight_std: bool = True
    init_filter: int = 24
    in_channel: int = 2
    s2d: bool = True

    @nn.compact
    def __call__(self, x):
        """x: (B, D, H, W, in_channel) voxel tensor, or a tuple of in_channel
        planes (B, D, H, W). The tuple form packs the well-tiled planes
        straight into the block domain (ops/s2d.s2d_pack) — a full-res C=2
        channels-last tensor pads the 128-lane minor dim 64x, so never
        materializing it saves ~64x its logical read bytes."""
        f = self.init_filter
        ws = self.weight_std
        planes = x if isinstance(x, (tuple, list)) else None
        spatial = (planes[0] if planes is not None else x).shape[1:4]
        use_s2d = self.s2d and all(int(s) % 2 == 0 for s in spatial)
        use_s2d2 = self.s2d and all(int(s) % 4 == 0 for s in spatial)

        if use_s2d:
            xb = s2d_pack(list(planes)) if planes is not None else space_to_depth(x)
            x = WSConv3dS2D(f, stride=2, weight_std=ws, packing="a",
                            name="conv0")(xb)
        else:
            if planes is not None:
                x = jnp.stack(list(planes), axis=-1)
            x = WSConv3d(f, stride=2, padding=1, weight_std=ws, name="conv0")(x)

        if use_s2d2:
            xb = WSConv3dS2D(f, stride=1, weight_std=ws, packing="a",
                             name="conv1")(space_to_depth(x))
            xb = ResStageS2D(f, self.layers[0], stride=1, group=4, weight_std=ws,
                             name="layer0")(xb)
            skip0 = xb  # shifted block tensor
            x = ResStageS2D(f * 2, self.layers[1], stride=2, group=4, weight_std=ws,
                            name="layer1")(xb)
        else:
            x = WSConv3d(f, stride=1, padding=1, weight_std=ws, name="conv1")(x)
            x = ResStage(f, self.layers[0], stride=1, group=4, weight_std=ws,
                         name="layer0")(x)
            skip0 = x
            x = ResStage(f * 2, self.layers[1], stride=2, group=4, weight_std=ws,
                         name="layer1")(x)
        skip1 = x
        x = ResStage(f * 4, self.layers[2], stride=2, group=4, weight_std=ws, name="layer2")(x)
        skip2 = x
        x = ResStage(f * 8, self.layers[3], stride=2, group=4, weight_std=ws, name="layer3")(x)
        skip3 = x
        x = ResStage(f * 8, self.layers[4], stride=2, group=4, weight_std=ws, name="layer4")(x)

        x = GNReLUConv(f * 8, num_groups=f // 2, weight_std=ws, use_bias=False, name="fusion")(x)

        x = upsample_trilinear(x, 2) + skip3
        x = ResStage(f * 4, 1, stride=1, group=4, weight_std=ws, name="x8_resb")(x)
        x = upsample_trilinear(x, 2) + skip2
        x = ResStage(f * 2, 1, stride=1, group=4, weight_std=ws, name="x4_resb")(x)
        x = upsample_trilinear(x, 2) + skip1
        x = ResStage(f, 1, stride=1, group=4, weight_std=ws, name="x2_resb")(x)

        if use_s2d2:
            xb = s2d_upsample_trilinear(x, packing="s") + skip0
            xb = ResStageS2D(f, 1, stride=1, group=4, weight_std=ws, name="x1_resb")(xb)
            logits = depth_to_space_shifted(
                GNReLUConvS2D(self.num_classes, num_groups=f // 4, packing="s",
                              name="precls")(xb))
        else:
            x = upsample_trilinear(x, 2) + skip0
            x = ResStage(f, 1, stride=1, group=4, weight_std=ws, name="x1_resb")(x)
            logits = GNReLUConv(self.num_classes, num_groups=f // 4, name="precls")(x)

        if use_s2d:
            return depth_to_space(s2d_upsample_trilinear(logits, packing="a"))
        return upsample_trilinear(logits, 2)
