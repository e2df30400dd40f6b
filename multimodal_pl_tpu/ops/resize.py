"""Spatial resizing ops matched to the torch conventions used by the reference.

- ``upsample_trilinear`` / ``resize_trilinear``: half-pixel-center linear
  interpolation == ``nn.Upsample(mode='trilinear', align_corners=False)``
  (reference unet3D.py:963-965).
- ``resize_nearest``: torch ``F.interpolate(mode='nearest')`` floor-indexing
  convention (src = floor(dst * in/out)) — used for mask downsampling in the
  token EMA (unet3D.py:1056) and the atlas volume resize (MOTSDataset.py:357).

All ops are channels-last: (N, D, H, W, C); spatial dims are axes 1..3.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def resize_trilinear(x: jax.Array, out_spatial: Sequence[int]) -> jax.Array:
    """Trilinear resize of an NDHWC tensor to spatial shape ``out_spatial``."""
    n, _, _, _, c = x.shape
    out_shape = (n, *out_spatial, c)
    return jax.image.resize(x, out_shape, method="trilinear")


def upsample_trilinear(x: jax.Array, factor: int = 2) -> jax.Array:
    """x{factor} trilinear upsampling (align_corners=False semantics)."""
    n, d, h, w, c = x.shape
    return resize_trilinear(x, (d * factor, h * factor, w * factor))


def _nearest_indices(in_size: int, out_size: int) -> jax.Array:
    # torch F.interpolate(mode='nearest'): src = floor(dst * in / out)
    idx = (jnp.arange(out_size) * in_size) // out_size
    return jnp.clip(idx, 0, in_size - 1)


def resize_nearest(x: jax.Array, out_spatial: Sequence[int]) -> jax.Array:
    """Nearest resize (torch floor convention) of NDHWC spatial axes."""
    d, h, w = x.shape[1], x.shape[2], x.shape[3]
    od, oh, ow = out_spatial
    x = jnp.take(x, _nearest_indices(d, od), axis=1)
    x = jnp.take(x, _nearest_indices(h, oh), axis=2)
    x = jnp.take(x, _nearest_indices(w, ow), axis=3)
    return x


def downsample_nearest(x: jax.Array, factor: int) -> jax.Array:
    """Fast path for integer-factor nearest downsampling: stride slicing.

    Equals the torch floor convention when in = out * factor.
    """
    return x[:, ::factor, ::factor, ::factor, :]
