"""Fused GroupNorm -> ReLU as a two-pass Pallas TPU kernel.

The GN->ReLU(->conv) pre-activation pattern occurs ~40 times per U-Net
forward (models/blocks.py NoBottleneck / GNReLUConv). Statistics need a full
per-(sample, group) reduction, but decoder feature maps exceed VMEM, so the
kernel runs two passes over spatial blocks:

  pass 1: per-block partial (sum, sumsq) accumulated across the sequential
          TPU grid into an (N, G, 2) stats output;
  pass 2: normalize + affine + ReLU elementwise with the finalized stats.

Both passes stream each block HBM->VMEM exactly once; XLA's stock lowering
materializes the normalized tensor before the ReLU when the consumer can't
fuse, which this avoids by construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stats_kernel(x_ref, out_ref):
    """x: (1, BS, C) block; out: (1, G, 2) accumulated (sum, sumsq)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    x = x_ref[0].astype(jnp.float32)              # (BS, C)
    bs, c = x.shape
    g = out_ref.shape[1]
    xg = x.reshape(bs, g, c // g)
    s = jnp.sum(xg, axis=(0, 2))                  # (G,)
    ss = jnp.sum(xg * xg, axis=(0, 2))
    out_ref[0, :, 0] += s
    out_ref[0, :, 1] += ss


def _norm_kernel(x_ref, stats_ref, scale_ref, bias_ref, count_ref, out_ref):
    x = x_ref[0].astype(jnp.float32)              # (BS, C)
    bs, c = x.shape
    g = stats_ref.shape[1]
    cpg = c // g
    n = count_ref[0]
    mean = stats_ref[0, :, 0] / n                 # (G,)
    var = stats_ref[0, :, 1] / n - mean * mean
    inv = jax.lax.rsqrt(var + 1e-5)
    mean_c = jnp.repeat(mean, cpg)
    inv_c = jnp.repeat(inv, cpg)
    y = (x - mean_c[None, :]) * inv_c[None, :] * scale_ref[...] + bias_ref[...]
    out_ref[0] = jnp.maximum(y, 0.0).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_groups", "block_spatial", "interpret"))
def fused_group_norm_relu(x, scale, bias, num_groups: int, block_spatial: int = 2048,
                          interpret: bool = False):
    """relu(group_norm(x)) for NDHWC (or any N...C) input.

    Matches ops.norm.group_norm (eps=1e-5, contiguous groups) followed by ReLU.
    """
    orig_shape = x.shape
    n, c = orig_shape[0], orig_shape[-1]
    s = 1
    for d in orig_shape[1:-1]:
        s *= d
    xf = x.reshape(n, s, c)

    # pad spatial to a block multiple (padded zeros are excluded via count)
    nb = pl.cdiv(s, block_spatial)
    pad = nb * block_spatial - s
    if pad:
        xf = jnp.pad(xf, ((0, 0), (0, pad), (0, 0)))

    stats = pl.pallas_call(
        _stats_kernel,
        grid=(n, nb),
        in_specs=[pl.BlockSpec((1, block_spatial, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, num_groups, 2), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, num_groups, 2), jnp.float32),
        interpret=interpret,
    )(xf)

    count = jnp.full((1,), float(s * (c // num_groups)), jnp.float32)
    out = pl.pallas_call(
        _norm_kernel,
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec((1, block_spatial, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_groups, 2), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_spatial, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        interpret=interpret,
    )(xf, stats, scale.astype(jnp.float32), bias.astype(jnp.float32), count)

    if pad:
        out = out[:, :s]
    return out.reshape(orig_shape)
