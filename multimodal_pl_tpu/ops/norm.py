"""Normalization ops (channels-last), numerically matched to torch defaults.

GroupNorm statistics are computed per (sample, group) over
(spatial..., channels_per_group) with eps=1e-5, matching ``nn.GroupNorm``
as used throughout the reference model zoo (e.g. unet3D.py:44-49).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


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
    cpg = c // num_groups
    sp_axes = tuple(range(1, x.ndim - 1))
    bshape = (n,) + (1,) * (x.ndim - 2) + (c,)
    cnt = float(np.prod(orig_shape[1:-1]) * cpg)
    # Stats per (n, group) over (spatial, c_per_group), always in f32 so a
    # bf16 compute policy doesn't destabilize the normalization. Reductions
    # go per-CHANNEL first (spatial axes only — no lane-splitting reshape of
    # the big tensor, which costs a TPU relayout) and pool groups on the tiny
    # (n, c) partials; two-pass moments as before.
    xf = x.astype(jnp.float32)
    csum = jnp.sum(xf, axis=sp_axes)                              # (n, c)
    gmean = csum.reshape(n, num_groups, cpg).sum(-1) / cnt        # (n, G)
    mean_c = jnp.repeat(gmean, cpg, axis=-1).reshape(bshape)
    dev = xf - mean_c
    css = jnp.sum(jnp.square(dev), axis=sp_axes)                  # (n, c)
    gvar = css.reshape(n, num_groups, cpg).sum(-1) / cnt
    inv_c = jnp.repeat(jax.lax.rsqrt(gvar + eps), cpg, axis=-1).reshape(bshape)
    out = (dev * inv_c).astype(x.dtype)
    return out * scale + bias


# ---------------------------------------------------------------------------
# Fused GN -> ReLU (Pallas kernel, ops/pallas/fused_gn_relu.py)
#
# The GN->ReLU pre-activation pattern occurs ~40x per U-Net forward; the
# kernel streams each block HBM->VMEM once per pass instead of letting XLA
# materialize the normalized tensor when the consumer can't fuse. Enabled
# globally (read at trace time) via set_fused_gn_relu — the StepConfig /
# CLI --pallas_gn flag calls this before building the step. Training works
# through a custom VJP whose backward recomputes the standard formula
# (rematerialization — no extra residuals saved).
# ---------------------------------------------------------------------------

_FUSED_GN_RELU = False


def set_fused_gn_relu(enabled: bool) -> None:
    global _FUSED_GN_RELU
    _FUSED_GN_RELU = bool(enabled)


def fused_gn_relu_enabled() -> bool:
    return _FUSED_GN_RELU


def _gn_relu_reference(x, scale, bias, num_groups, eps):
    return jax.nn.relu(group_norm(x, scale, bias, num_groups, eps))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gn_relu_pallas(x, scale, bias, num_groups, eps):
    from multimodal_pl_tpu.ops.pallas.fused_gn_relu import fused_group_norm_relu

    # kernel applies the affine in f32 before the cast; eps is fixed at 1e-5
    return fused_group_norm_relu(x, scale.astype(jnp.float32),
                                 bias.astype(jnp.float32), num_groups,
                                 interpret=jax.default_backend() != "tpu")


def _gn_relu_fwd(x, scale, bias, num_groups, eps):
    return _gn_relu_pallas(x, scale, bias, num_groups, eps), (x, scale, bias)


def _gn_relu_bwd(num_groups, eps, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x, s, b: _gn_relu_reference(x, s, b, num_groups, eps), x, scale, bias)
    return vjp(g)


_gn_relu_pallas.defvjp(_gn_relu_fwd, _gn_relu_bwd)


def group_norm_relu(x, scale, bias, num_groups, eps: float = 1e-5):
    """relu(group_norm(x)) — dispatches to the fused Pallas kernel when
    enabled (TPU compiles it natively; other backends run it interpreted,
    so tests exercise the same code path)."""
    if _FUSED_GN_RELU and eps == 1e-5:
        return _gn_relu_pallas(x, scale, bias, num_groups, eps)
    return _gn_relu_reference(x, scale, bias, num_groups, eps)


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
