"""Normalization ops (channels-last), numerically matched to torch defaults.

GroupNorm statistics are computed per (sample, group) over
(spatial..., channels_per_group) with eps=1e-5, matching ``nn.GroupNorm``
as used throughout the reference model zoo (e.g. unet3D.py:44-49).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def group_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int,
    eps: float = 1e-5,
) -> jax.Array:
    """GroupNorm over an NDHWC (or any N...C) tensor.

    Channels are split into ``num_groups`` contiguous groups (torch semantics).
    """
    orig_shape = x.shape
    c = orig_shape[-1]
    assert c % num_groups == 0, f"channels {c} not divisible by groups {num_groups}"
    n = orig_shape[0]
    spatial = orig_shape[1:-1]
    xg = x.reshape(n, -1, num_groups, c // num_groups)
    # stats per (n, group) over (spatial, c_per_group), always in f32 so a
    # bf16 compute policy doesn't destabilize the normalization
    xf = xg.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    xg = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    out = xg.reshape(n, *spatial, c)
    return out * scale + bias


def layer_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    eps: float = 1e-5,
) -> jax.Array:
    """LayerNorm over the last axis (torch nn.LayerNorm default eps)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias
