"""Dense k2 block-domain conv as a Pallas TPU kernel (fused im2col).

The s2d block domain turns every full-resolution 3x3x3 conv into a dense
2x2x2 conv over (B, D, H, W, 8C) block tensors (ops/s2d.py). XLA's
conv_general lowering runs it at ~80 TFLOP/s effective; a single matmul
against the 8 concatenated shifted views reaches ~113 TFLOP/s but pays more
than the difference to MATERIALIZE the 8x view tensor in HBM (PERF.md round-2
log). This kernel captures the matmul win without the materialization: each
grid step DMAs one (2, TH+1, W, K) input band HBM->VMEM, forms the 8 shifted
views in VMEM (zero-copy slices), and accumulates 8 MXU matmuls into an f32
tile.

Semantics: VALID k2 conv — out[b, d, h, w] = sum_{t in {0,1}^3}
x[b, d+t0, h+t1, w+t2] @ W[t]; the s2d callers' 'SAME'-style paddings are
applied by the wrapper via one jnp.pad (s2d_conv3x3 packing='a' pads 1,
packing='s' pads 0).

Training runs through a custom VJP with explicit XLA gradients (dx as the
flipped-tap transposed conv, dw as 8 view contractions) — no pallas in the
backward yet.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DN = ("NDHWC", "DHWIO", "NDHWC")


def _kernel(x_hbm, w_ref, out_ref, xs, acc, sem, *, th: int, wo: int):
    """One grid step: out rows [h*th, (h+1)*th) of depth-slice d, batch b."""
    b = pl.program_id(0)
    d = pl.program_id(1)
    h = pl.program_id(2)
    k = x_hbm.shape[-1]

    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(d, 2), pl.ds(h * th, th + 1)], xs, sem)
    cp.start()
    cp.wait()

    acc[...] = jnp.zeros_like(acc)
    for a in range(2):
        for bb in range(2):
            for c in range(2):
                view = xs[a, bb:bb + th, c:c + wo, :].reshape(th * wo, k)
                acc[...] += jax.lax.dot_general(
                    view, w_ref[a, bb, c],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    out_ref[0, 0] = acc[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("th", "wo"))
def _k2_valid_pallas(x, w, th: int, wo: int):
    """k2 conv computing output extents (Di-1, Hi-1, wo). Caller guarantees
    the Mosaic tiling constraints: Wi % 8 == 0 (the DMA'd band's sublane
    extent must be 8-aligned), wo % 8 == 0, wo + 1 <= Wi, (Hi-1) % th == 0.
    x: (B, Di, Hi, Wi, K); w: (2, 2, 2, K, N)."""
    bsz, di, hi, wi, k = x.shape
    n = w.shape[-1]
    do, ho = di - 1, hi - 1
    nh = ho // th

    out = pl.pallas_call(
        functools.partial(_kernel, th=th, wo=wo),
        grid=(bsz, do, nh),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),     # full kernel
        ],
        out_specs=pl.BlockSpec((1, 1, th * wo, n),
                               lambda b, d, h: (b, d, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, do, ho * wo, n), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 1, wi, k), x.dtype),
            pltpu.VMEM((th * wo, n), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        # off-TPU (CPU tests) run the same code path interpreted
        interpret=jax.default_backend() != "tpu",
    )(x, w)
    return out.reshape(bsz, do, ho, wo, n)


def _k2_valid_xla(x, w):
    return lax.conv_general_dilated(x, w, (1, 1, 1), [(0, 0)] * 3,
                                    dimension_numbers=_DN)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def k2_conv_valid(x, w, th, wo):
    """Dense k2 conv via the Pallas kernel, with XLA gradients. See
    :func:`_k2_valid_pallas` for the shape contract; use :func:`k2_conv`
    for automatic padding."""
    return _k2_valid_pallas(x, w, th, wo)


def _k2_fwd(x, w, th, wo):
    return _k2_valid_pallas(x, w, th, wo), (x, w)


def _k2_bwd(th, wo, res, g):
    x, w = res
    bsz, di, hi, wi, k = x.shape
    g = g.astype(x.dtype)
    # pad g back to the full VALID output extent (wi - 1) so the transposed
    # conv below sees the true geometry (cols >= wo got no gradient)
    if wo < wi - 1:
        g = jnp.pad(g, [(0, 0), (0, 0), (0, 0), (0, wi - 1 - wo), (0, 0)])
    # dx: 'full' correlation = pad-1 conv with taps flipped, channels swapped
    w_rev = w[::-1, ::-1, ::-1].swapaxes(3, 4)
    dx = lax.conv_general_dilated(g, w_rev, (1, 1, 1), [(1, 1)] * 3,
                                  dimension_numbers=_DN)
    # dw[t] = sum_spatial x_view_t^T g. (A single batch<->feature-swapped
    # conv formulation measured SLOWER on v5e — 544 vs 519 ms/train-step —
    # so the per-tap contraction stays. Training through this VJP is slower
    # than the XLA lowering either way (residuals save the PADDED x);
    # pallas_k2 is an inference-path optimization — see PERF.md.)
    do, ho, wfull = di - 1, hi - 1, wi - 1
    taps = []
    for a in (0, 1):
        for bb in (0, 1):
            for c in (0, 1):
                view = lax.slice(x, (0, a, bb, c, 0),
                                 (bsz, do + a, ho + bb, wfull + c, k))
                taps.append(jnp.einsum("bdhwk,bdhwn->kn", view, g,
                                       preferred_element_type=jnp.float32))
    dw = jnp.stack(taps).reshape(2, 2, 2, k, w.shape[-1]).astype(w.dtype)
    return dx, dw


k2_conv_valid.defvjp(_k2_fwd, _k2_bwd)


def k2_conv(x, w, pad: int = 0, th: int = 8):
    """Dense k2 conv with symmetric spatial zero ``pad`` (0 or 1) through the
    Pallas kernel, padding H/W up to the kernel's tiling requirements
    (W band 8-aligned for the DMA, output rows th-aligned) and slicing the
    result back. Falls back to XLA conv_general for shapes the kernel does
    not handle (tiny spatial dims)."""
    if pad:
        x = jnp.pad(x, [(0, 0)] + [(pad, pad)] * 3 + [(0, 0)])
    bsz, di, hi, wi, k = x.shape
    n = w.shape[-1]
    do, ho, wo = di - 1, hi - 1, wi - 1
    # Mosaic requires the HBM->VMEM band DMA's lane (last) dim 128-aligned;
    # tiny-channel convs (e.g. the 8-channel s2d stem) go through XLA.
    if do < 1 or ho < th or wo < 8 or k % 128 or n % 128:
        return _k2_valid_xla(x, w)
    wo_k = -(-wo // 8) * 8              # kernel's output cols (8-aligned)
    wi_k = -(-(wo_k + 1) // 8) * 8      # DMA band width (8-aligned, > wo_k)
    ho_k = -(-ho // th) * th
    hi_k = ho_k + 1
    if hi_k != hi or wi_k != wi:
        x = jnp.pad(x, [(0, 0), (0, 0), (0, hi_k - hi), (0, wi_k - wi), (0, 0)])
    out = k2_conv_valid(x, w, th, wo_k)
    if ho_k != ho or wo_k != wo:
        out = out[:, :, :ho, :wo, :]
    return out
