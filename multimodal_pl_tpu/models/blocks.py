"""Building blocks for the 3D U-Net family (channels-last, flax.linen).

Mirrors the behavior of the reference blocks (cited per class) while using
explicit torch-convention padding so strided convs align voxel-for-voxel.
Initializers reproduce torch's kaiming_uniform(a=sqrt(5)) Conv/Linear default.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from multimodal_pl_tpu.ops.conv import conv3d, standardize_kernel

# torch Conv/Linear default weight init: kaiming_uniform(a=sqrt(5)) ==
# U(-sqrt(1/fan_in), sqrt(1/fan_in)) == variance_scaling(1/3, fan_in, uniform)
torch_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class WSConv3d(nn.Module):
    """(Optionally weight-standardized) 3D conv — reference unet3D.py:16-35.

    Padding is explicit symmetric (torch convention), so strided convs match
    torch alignment rather than XLA 'SAME' lo/hi asymmetry.
    """

    features: int
    kernel: Sequence[int] = (3, 3, 3)
    stride: int | Sequence[int] = 1
    padding: int | Sequence[int] = 1
    use_bias: bool = False
    weight_std: bool = True

    @nn.compact
    def __call__(self, x):
        kd, kh, kw = self.kernel
        w = self.param(
            "kernel", torch_init, (kd, kh, kw, x.shape[-1], self.features), jnp.float32
        )
        w = w.astype(x.dtype)
        if self.weight_std:
            w = standardize_kernel(w)
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad)] * 3
        else:
            pad = [(p, p) for p in pad]
        bias = None
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
            bias = bias.astype(x.dtype)
        return conv3d(x, w, stride=self.stride, padding=pad, bias=bias)


class GroupNorm(nn.Module):
    """torch-compatible GroupNorm (eps=1e-5, contiguous channel groups)."""

    num_groups: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,), jnp.float32)
        from multimodal_pl_tpu.ops.norm import group_norm

        return group_norm(x, scale.astype(x.dtype), bias.astype(x.dtype), self.num_groups, self.eps)


class GNReLUConv(nn.Module):
    """GroupNorm -> ReLU -> 1x1x1 (or kxkxk) conv head.

    The pattern of the reference's fusionConv / deepout / precls_conv heads
    (unet3D.py:957-1004).
    """

    features: int
    num_groups: int = 16
    kernel: Sequence[int] = (1, 1, 1)
    stride: int | Sequence[int] = 1
    padding: int = 0
    weight_std: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        x = GroupNorm(self.num_groups, name="gn")(x)
        x = nn.relu(x)
        return WSConv3d(
            self.features,
            kernel=self.kernel,
            stride=self.stride,
            padding=self.padding,
            use_bias=self.use_bias,
            weight_std=self.weight_std,
            name="conv",
        )(x)


class NoBottleneck(nn.Module):
    """Pre-activation residual block — reference unet3D.py:40-73.

    GN -> ReLU -> conv3(s) -> GN -> ReLU -> conv3(1), plus a GN-ReLU-conv1(s)
    projection shortcut when the stride or channel count changes.
    """

    features: int
    stride: int | Sequence[int] = 1
    group: int = 16
    weight_std: bool = True

    @nn.compact
    def __call__(self, x):
        inplanes = x.shape[-1]
        stride = self.stride if not isinstance(self.stride, int) else (self.stride,) * 3
        needs_proj = any(s != 1 for s in stride) or inplanes != self.features

        out = GroupNorm(self.group, name="gn1")(x)
        out = nn.relu(out)
        out = WSConv3d(
            self.features, stride=stride, padding=1, weight_std=self.weight_std, name="conv1"
        )(out)
        out = GroupNorm(self.group, name="gn2")(out)
        out = nn.relu(out)
        out = WSConv3d(self.features, stride=1, padding=1, weight_std=self.weight_std, name="conv2")(out)

        residual = x
        if needs_proj:
            residual = GNReLUConv(
                self.features,
                num_groups=self.group,
                kernel=(1, 1, 1),
                stride=stride,
                padding=0,
                weight_std=self.weight_std,
                use_bias=False,
                name="downsample",
            )(x)
        return out + residual


class ResStage(nn.Module):
    """A stack of NoBottleneck blocks — reference _make_layer (unet3D.py:1029-1049).

    Only the first block strides / changes channels; the rest are identity-residual.
    """

    features: int
    blocks: int
    stride: int | Sequence[int] = 1
    group: int = 16
    weight_std: bool = True

    @nn.compact
    def __call__(self, x):
        x = NoBottleneck(
            self.features, stride=self.stride, group=self.group, weight_std=self.weight_std, name="block0"
        )(x)
        for i in range(1, self.blocks):
            x = NoBottleneck(
                self.features, stride=1, group=self.group, weight_std=self.weight_std, name=f"block{i}"
            )(x)
        return x
