"""Fused GroupNorm -> ReLU as a two-pass Pallas TPU kernel.

The GN->ReLU(->conv) pre-activation pattern occurs ~40 times per U-Net
forward (models/blocks.py NoBottleneck / GNReLUConv). Statistics need a full
per-(sample, group) reduction, but decoder feature maps exceed VMEM, so the
kernel runs two passes over spatial blocks:

  pass 1: per-block partial per-CHANNEL (sum, sumsq) accumulated across the
          sequential TPU grid into an (N, 2, C) stats output — the channel
          lane dimension is never reshaped (Mosaic cannot lay out a lane
          split like (BS, C) -> (BS, G, C/G); the group pooling is C -> G
          on a tiny (N, 2, C) tensor, done between passes in plain XLA);
  pass 2: normalize + affine + ReLU elementwise with per-channel
          broadcast vectors (mean/inv already group-pooled and re-expanded).

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
    """x: (1, BS, C) block; out: (1, 2, C) accumulated per-channel (sum, sumsq)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    x = x_ref[0].astype(jnp.float32)              # (BS, C)
    out_ref[0, 0, :] += jnp.sum(x, axis=0)
    out_ref[0, 1, :] += jnp.sum(x * x, axis=0)


def _norm_kernel(x_ref, mean_ref, inv_ref, scale_ref, bias_ref, out_ref):
    """Elementwise: relu((x - mean_c) * inv_c * scale + bias) with (1, 1, C)
    per-channel broadcast rows (group stats pre-pooled outside; rows are 3-D
    so their blocks satisfy Mosaic's last-two-dims rule for any N)."""
    x = x_ref[0].astype(jnp.float32)              # (BS, C)
    y = (x - mean_ref[0, 0]) * inv_ref[0, 0] * scale_ref[0, 0] + bias_ref[0, 0]
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

    # pad spatial to a block multiple (padded zeros drop out via the true count)
    nb = pl.cdiv(s, block_spatial)
    pad = nb * block_spatial - s
    if pad:
        xf = jnp.pad(xf, ((0, 0), (0, pad), (0, 0)))

    stats = pl.pallas_call(
        _stats_kernel,
        grid=(n, nb),
        in_specs=[pl.BlockSpec((1, block_spatial, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2, c), jnp.float32),
        interpret=interpret,
    )(xf)

    # group pooling on the tiny stats tensor (plain XLA): per-(sample, group)
    # moments, re-expanded to per-channel broadcast rows
    cpg = c // num_groups
    count = float(s * cpg)
    gsum = stats[:, 0].reshape(n, num_groups, cpg).sum(-1)     # (N, G)
    gss = stats[:, 1].reshape(n, num_groups, cpg).sum(-1)
    gmean = gsum / count
    gvar = gss / count - gmean * gmean
    ginv = jax.lax.rsqrt(gvar + 1e-5)
    mean_c = jnp.repeat(gmean, cpg, axis=-1)                   # (N, C)
    inv_c = jnp.repeat(ginv, cpg, axis=-1)

    out = pl.pallas_call(
        _norm_kernel,
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec((1, block_spatial, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_spatial, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        interpret=interpret,
    )(xf, mean_c[:, None], inv_c[:, None],
      scale.astype(jnp.float32)[None, None], bias.astype(jnp.float32)[None, None])

    if pad:
        out = out[:, :s]
    return out.reshape(orig_shape)
