"""Modality (CT vs MRI) style discriminators.

Reference: unet3D.py:1814-1956. Strided Conv3d + LeakyReLU(0.2) pyramids over
(organ probability, atlas) channel pairs; the "deep" variant additionally
ingests the three multi-scale attention maps through 3x3x3 "min" blocks.
All convs use torch-default init and explicit padding 1 with kernel 4 so the
stride-2 geometry matches the reference voxel-for-voxel.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from multimodal_pl_tpu.models.blocks import WSConv3d, WSConv4x4S2D
from multimodal_pl_tpu.models.unet3d import _Linear
from multimodal_pl_tpu.ops.s2d import s2d_pack


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


def _conv(features, kernel=4, stride=2, padding=1, name=None):
    return WSConv3d(
        features,
        kernel=(kernel,) * 3,
        stride=stride,
        padding=padding,
        use_bias=True,
        weight_std=False,
        name=name,
    )


def _stem(features, x, name="block1"):
    """block1 over the (organ-prob, atlas) pair. Accepts either a voxel
    tensor (B, D, H, W, C) or a tuple of C planes (B, D, H, W).

    The tuple form is the TPU fast path: a full-resolution C=2 channels-last
    tensor pads the 128-lane minor dim 64x, so reading it costs ~64x its
    logical bytes; packing the well-tiled planes straight into the s2d block
    domain and running the k4-s2 conv there (identical params/math,
    tests/test_s2d.py) avoids ever materializing it."""
    if isinstance(x, (tuple, list)):
        if all(int(s) % 2 == 0 for s in x[0].shape[1:4]):
            return _lrelu(WSConv4x4S2D(features, name=name)(s2d_pack(list(x))))
        x = jnp.stack(list(x), axis=-1)
    return _lrelu(_conv(features, name=name)(x))


class NormStyleDiscriminator(nn.Module):
    """norm_style_discriminator_output (unet3D.py:1907-1947): plain pyramid ->
    global average pool -> Linear(ndf*8, 2).

    depth = number of stride-2 convs (reference: 6, which sets the 64-voxel
    minimum patch — at 2**(depth-1) input the final feature map is 1^3; any
    smaller and the last conv yields a ZERO-size tensor whose mean is NaN).
    depth=6 reproduces the reference block names/features exactly; smaller
    depths exist for the tiny-geometry dryrun/test tier (32^3 -> depth 5,
    16^3 -> depth 4)."""

    ndf: int = 32
    depth: int = 6

    @nn.compact
    def __call__(self, x):
        x = _stem(self.ndf, x, name="block1")
        for i in range(1, self.depth):
            feats = self.ndf * min(2 ** i, 8)
            name = f"block{i + 1}" if i < 3 else "block4" + "abcdefg"[i - 3]
            x = _lrelu(_conv(feats, name=name)(x))
        x = jnp.mean(x, axis=(1, 2, 3))
        return _Linear(2, name="head")(x)


class DeepStyleDiscriminator(nn.Module):
    """deep_style_discriminator_output (unet3D.py:1852-1905): the pyramid also
    consumes the three per-scale attention maps via 3x3x3 min-blocks."""

    ndf: int = 32

    @nn.compact
    def __call__(self, x, attn_maps):
        # attn_maps: [scale8 (B,8d,...), scale4, scale2] per-organ single-channel maps
        ndf = self.ndf
        x = _stem(ndf, x, name="block1")
        xm1 = _lrelu(_conv(ndf, kernel=3, stride=1, padding=1, name="min_block1")(attn_maps[2]))
        x = _lrelu(_conv(ndf * 2, name="block2")(jnp.concatenate([x, xm1], -1)))
        xm2 = _lrelu(_conv(ndf * 2, kernel=3, stride=1, padding=1, name="min_block2")(attn_maps[1]))
        x = _lrelu(_conv(ndf * 4, name="block3")(jnp.concatenate([x, xm2], -1)))
        xm3 = _lrelu(_conv(ndf * 4, kernel=3, stride=1, padding=1, name="min_block3")(attn_maps[0]))
        x = jnp.concatenate([x, xm3], -1)
        x = _lrelu(_conv(ndf * 8, name="block4a")(x))
        x = _lrelu(_conv(ndf * 8, name="block4b")(x))
        x = _lrelu(_conv(ndf * 8, name="block4c")(x))
        x = jnp.mean(x, axis=(1, 2, 3))
        return _Linear(2, name="head")(x)


class StyleDiscriminatorOutput(nn.Module):
    """get_style_discriminator_output (unet3D.py:1832-1849): 1-logit variant."""

    ndf: int = 32

    @nn.compact
    def __call__(self, x):
        x = _lrelu(_conv(self.ndf, name="block1")(x))
        x = _lrelu(_conv(self.ndf * 2, name="block2")(x))
        x = _lrelu(_conv(self.ndf * 4, name="block3")(x))
        x = _lrelu(_conv(self.ndf * 8, name="block4a")(x))
        x = _lrelu(_conv(self.ndf * 8, name="block4b")(x))
        x = _lrelu(_conv(self.ndf * 8, name="block4c")(x))
        x = jnp.mean(x, axis=(1, 2, 3))
        return _Linear(1, name="head")(x)


class StyleDiscriminatorLinear(nn.Module):
    """get_style_discriminator_linear (unet3D.py:1950-1956)."""

    ndf: int = 64

    @nn.compact
    def __call__(self, x):
        x = _lrelu(_Linear(self.ndf, name="fc1")(x))
        x = _lrelu(_Linear(self.ndf * 2, name="fc2")(x))
        return _Linear(1, name="fc3")(x)
