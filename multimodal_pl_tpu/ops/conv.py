"""3D convolution primitives (channels-last NDHWC).

Weight standardization follows the reference semantics
(/root/reference/unet3D.py:16-27): per-output-channel mean subtraction over
(in, kd, kh, kw) followed by division by sqrt(var + 1e-12) where the variance
is the *unbiased* (ddof=1) variance over the flattened per-output-channel
kernel — matching ``torch.var``'s default correction.

Kernels are stored (kd, kh, kw, in, out) ("DHWIO"), activations (N, D, H, W, C)
("NDHWC") — the layout XLA lowers onto the TPU MXU without transposes.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

DIMENSION_NUMBERS = ("NDHWC", "DHWIO", "NDHWC")


def standardize_kernel(w: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Weight-standardize a (kd, kh, kw, in, out) conv kernel.

    Equivalent to the reference's WS-Conv3d forward-time weight transform
    (unet3D.py:21-26): subtract the per-out-channel mean, divide by the
    per-out-channel unbiased std. Statistics are computed in f32 regardless of
    the compute dtype (bf16 variances of near-identical weights lose most of
    their significand).
    """
    dtype = w.dtype
    w = w.astype(jnp.float32)
    mean = jnp.mean(w, axis=(0, 1, 2, 3), keepdims=True)
    w = w - mean
    flat = w.reshape(-1, w.shape[-1])
    var = jnp.var(flat, axis=0, ddof=1)
    std = jnp.sqrt(var + eps)
    return (w / std).astype(dtype)


def _norm_stride(stride) -> Sequence[int]:
    if isinstance(stride, int):
        return (stride, stride, stride)
    return tuple(stride)


def conv3d(
    x: jax.Array,
    w: jax.Array,
    stride=1,
    padding="SAME",
    bias: jax.Array | None = None,
    precision=None,
) -> jax.Array:
    """Plain 3D conv, NDHWC x DHWIO -> NDHWC.

    Voxel k3/stride-1 convs whose channel counts are 128-multiples (the
    C>=128 stages) route through the tap-exact Pallas band kernel when the
    bd engine is enabled (ops/bd.set_bd_pallas) — measured ~142 vs ~42
    TF/s for the C=128 quarter-resolution stage (PERF.md round 5)."""
    if isinstance(padding, int):
        padding = [(padding, padding)] * 3
    if (w.shape[:3] == (3, 3, 3) and _norm_stride(stride) == (1, 1, 1)
            and not isinstance(padding, str)
            and w.shape[3] % 128 == 0 and w.shape[4] % 128 == 0
            and precision is None and x.shape[2] >= 10 and x.shape[3] >= 10):
        from multimodal_pl_tpu.ops.bd import bd_pallas_enabled

        if bd_pallas_enabled():
            from multimodal_pl_tpu.ops.pallas.bk3_conv import bk3_impl

            out = bk3_impl(x, w, padding)
            if bias is not None:
                out = out + bias
            return out
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=_norm_stride(stride),
        padding=padding,
        dimension_numbers=DIMENSION_NUMBERS,
        precision=precision,
    )
    if bias is not None:
        out = out + bias
    return out


def ws_conv3d(
    x: jax.Array,
    w: jax.Array,
    stride=1,
    padding="SAME",
    bias: jax.Array | None = None,
    precision=None,
) -> jax.Array:
    """Weight-standardized 3D conv (reference unet3D.py:16-27)."""
    return conv3d(x, standardize_kernel(w), stride, padding, bias, precision)
