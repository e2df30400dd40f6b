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

Training runs through a custom VJP whose residuals are the UNPADDED operands
(pads recomputed in the backward); dx is itself a k2 conv (flipped taps,
channels swapped) and rides the same Pallas kernel, dw is 8 view
contractions in XLA.
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

# im2col-in-VMEM single-matmul kernel body (vs 8 accumulating matmuls);
# flipped by the microbench, baked in here once measured on hardware.
CONCAT_DEFAULT = False


def _kernel(x_hbm, w_ref, out_ref, xs, acc, sems, *, th: int, wo: int,
            concat: bool = False):
    """One grid step: out rows [h*th, (h+1)*th) of depth-slice d, batch b.

    The input band DMA is double-buffered across grid steps: each step kicks
    off the NEXT step's HBM->VMEM band copy before waiting on its own, so the
    copy rides under the 8 MXU matmuls (the TPU grid is sequential per core,
    and scratch/semaphores persist across steps)."""
    b = pl.program_id(0)
    d = pl.program_id(1)
    h = pl.program_id(2)
    nd = pl.num_programs(1)
    nh = pl.num_programs(2)
    k = x_hbm.shape[-1]
    i = (b * nd + d) * nh + h
    n_steps = pl.num_programs(0) * nd * nh
    slot = jax.lax.rem(i, 2)

    def band_dma(to_slot, bb, dd, hh):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(dd, 2), pl.ds(hh * th, th + 1)],
            xs.at[to_slot], sems.at[to_slot])

    @pl.when(i == 0)
    def _():
        band_dma(0, b, d, h).start()

    @pl.when(i + 1 < n_steps)
    def _():
        i1 = i + 1
        h1 = jax.lax.rem(i1, nh)
        t = jax.lax.div(i1, nh)
        band_dma(jax.lax.rem(i1, 2), jax.lax.div(t, nd), jax.lax.rem(t, nd), h1).start()

    band_dma(slot, b, d, h).wait()

    if concat:
        # single K=8k matmul against the 8 concatenated shifted views — the
        # im2col formulation, materialized only in VMEM (never HBM). One
        # accumulator pass instead of 8 read-modify-writes of the f32 tile.
        views = [
            xs[slot, a, bb:bb + th, c:c + wo, :].reshape(th * wo, k)
            for a in range(2) for bb in range(2) for c in range(2)
        ]
        big = jnp.concatenate(views, axis=-1)                  # (th*wo, 8k)
        acc[...] = jax.lax.dot_general(
            big, w_ref[...].reshape(8 * k, w_ref.shape[-1]),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        acc[...] = jnp.zeros_like(acc)
        for a in range(2):
            for bb in range(2):
                for c in range(2):
                    view = xs[slot, a, bb:bb + th, c:c + wo, :].reshape(th * wo, k)
                    acc[...] += jax.lax.dot_general(
                        view, w_ref[a, bb, c],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
    out_ref[0, 0] = acc[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("th", "wo", "concat"))
def _k2_valid_pallas(x, w, th: int, wo: int, concat: bool = False):
    """k2 conv computing output extents (Di-1, Hi-1, wo). Caller guarantees
    the Mosaic tiling constraints: Wi % 8 == 0 (the DMA'd band's sublane
    extent must be 8-aligned), wo % 8 == 0, wo + 1 <= Wi, (Hi-1) % th == 0.
    x: (B, Di, Hi, Wi, K); w: (2, 2, 2, K, N)."""
    bsz, di, hi, wi, k = x.shape
    n = w.shape[-1]
    do, ho = di - 1, hi - 1
    nh = ho // th

    out = pl.pallas_call(
        functools.partial(_kernel, th=th, wo=wo, concat=concat),
        grid=(bsz, do, nh),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),     # full kernel
        ],
        out_specs=pl.BlockSpec((1, 1, th * wo, n),
                               lambda b, d, h: (b, d, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, do, ho * wo, n), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2, th + 1, wi, k), x.dtype),   # double-buffered band
            pltpu.VMEM((th * wo, n), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # off-TPU (CPU tests) run the same code path interpreted
        interpret=jax.default_backend() != "tpu",
    )(x, w)
    return out.reshape(bsz, do, ho, wo, n)


def _k2_valid_xla(x, w):
    return lax.conv_general_dilated(x, w, (1, 1, 1), [(0, 0)] * 3,
                                    dimension_numbers=_DN)


# --------------------------------------------------------------------------- #
# fused GroupNorm -> ReLU -> k2 conv (inference path)
# --------------------------------------------------------------------------- #
#
# The pre-activation pattern GN -> ReLU -> conv costs a full activation
# round-trip between the normalize pass and the conv read. Folding the
# normalize into the conv kernel's input path removes it: the wrapper
# computes the group statistics in XLA (cheap per-channel partials, one read
# of x) and folds them with the affine params into per-(sample, channel) rows
# A = inv * scale, B = bias - mean * inv * scale; the kernel then applies
# t = relu(x * A + B), masked to zero at out-of-range positions, on the
# DMA'd band in VMEM before its matmuls. The mask replaces BOTH the s2d
# boundary-slab re-zeroing of shifted GroupNorm (ops/s2d.py
# s2d_group_norm(packing='s')) and the conv 'SAME' zero padding:
#
#   mode 'a': buffer coords carry a baked symmetric pad of 1 (+ alignment
#             pads); position i is valid iff 1 <= i <= n_axis (slot-blind).
#   mode 's': shifted packing; per axis with last real block n_axis,
#             (block i, slot p) is valid iff 1 <= i + p <= n_axis (the
#             closed form of "(0, slot0) and (n, slot1) are out of range",
#             alignment-pad blocks i > n_axis invalid in both slots).
#
# Forward-only by design (mirrors the _K2_PALLAS eval gate): training keeps
# the unfused path whose VJP is already tuned.


def _gn_kernel(x_hbm, w_ref, a_ref, b_ref, out_ref, xs, ts, acc, sems, *,
               th: int, wo: int, mode: str, bounds, c: int):
    """Band kernel of :func:`_k2_valid_pallas` with a fused masked
    normalize+ReLU transform between the DMA wait and the matmuls.

    bounds: (nd, nh, nw) — last VALID coordinate per axis (see module note).
    c: voxel channels (lane slot stride) for mode 's'.
    """
    b = pl.program_id(0)
    d = pl.program_id(1)
    h = pl.program_id(2)
    nd_g = pl.num_programs(1)
    nh_g = pl.num_programs(2)
    k = x_hbm.shape[-1]
    i = (b * nd_g + d) * nh_g + h
    n_steps = pl.num_programs(0) * nd_g * nh_g
    slot = jax.lax.rem(i, 2)
    nd, nh, nw = bounds

    def band_dma(to_slot, bb, dd, hh):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(dd, 2), pl.ds(hh * th, th + 1)],
            xs.at[to_slot], sems.at[to_slot])

    @pl.when(i == 0)
    def _():
        band_dma(0, b, d, h).start()

    @pl.when(i + 1 < n_steps)
    def _():
        i1 = i + 1
        h1 = jax.lax.rem(i1, nh_g)
        t = jax.lax.div(i1, nh_g)
        band_dma(jax.lax.rem(i1, 2), jax.lax.div(t, nd_g), jax.lax.rem(t, nd_g), h1).start()

    band_dma(slot, b, d, h).wait()

    av = a_ref[0, 0]                                   # (k,) f32
    bv = b_ref[0, 0]
    for a in range(2):
        x = xs[slot, a].astype(jnp.float32)            # (th+1, wi, k)
        rows = h * th + lax.broadcasted_iota(jnp.int32, x.shape, 0)
        cols = lax.broadcasted_iota(jnp.int32, x.shape, 1)
        if mode == "s":
            lane = lax.broadcasted_iota(jnp.int32, x.shape, 2)
            pd = lane // (4 * c)
            ph = (lane // (2 * c)) % 2
            pw = (lane // c) % 2
            valid = (((d + a + pd >= 1) & (d + a + pd <= nd))
                     & ((rows + ph >= 1) & (rows + ph <= nh))
                     & ((cols + pw >= 1) & (cols + pw <= nw)))
        else:
            valid = (((d + a >= 1) & (d + a <= nd))
                     & ((rows >= 1) & (rows <= nh))
                     & ((cols >= 1) & (cols <= nw)))
        t = jnp.maximum(x * av + bv, 0.0)
        ts[a] = jnp.where(valid, t, 0.0).astype(ts.dtype)

    acc[...] = jnp.zeros_like(acc)
    for a in range(2):
        for bb in range(2):
            for cc in range(2):
                view = ts[a, bb:bb + th, cc:cc + wo, :].reshape(th * wo, k)
                acc[...] += jax.lax.dot_general(
                    view, w_ref[a, bb, cc],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    out_ref[0, 0] = acc[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("th", "wo", "mode", "bounds"))
def _k2_gn_valid_pallas(x, w, arow, brow, th: int, wo: int, mode: str, bounds):
    """Masked-normalize k2 conv; same tiling contract as _k2_valid_pallas.
    arow/brow: (B, 1, K) f32 per-sample fold of the group statistics."""
    bsz, di, hi, wi, k = x.shape
    n = w.shape[-1]
    do, ho = di - 1, hi - 1
    nh = ho // th
    c = k // 8

    out = pl.pallas_call(
        functools.partial(_gn_kernel, th=th, wo=wo, mode=mode, bounds=bounds, c=c),
        grid=(bsz, do, nh),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),     # full kernel
            pl.BlockSpec((1, 1, k), lambda b, d, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda b, d, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, th * wo, n),
                               lambda b, d, h: (b, d, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, do, ho * wo, n), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2, th + 1, wi, k), x.dtype),   # double-buffered band
            pltpu.VMEM((2, th + 1, wi, k), x.dtype),      # transformed band
            pltpu.VMEM((th * wo, n), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=jax.default_backend() != "tpu",
    )(x, w, arow, brow)
    return out.reshape(bsz, do, ho, wo, n)


def k2_gn_conv(x, w, arow, brow, mode: str, th: int = 8):
    """Fused masked-GN+ReLU k2 conv (forward only).

    x: RAW (un-normalized) block tensor. mode 'a': caller has NOT padded —
    the symmetric SAME pad of 1 is applied here (pad values are dead: the
    in-kernel mask zeroes them post-transform). mode 's': shifted packing,
    no pad. Returns None if the shape falls outside the kernel's tiling
    contract (caller falls back to the unfused path).
    """
    if mode == "a":
        nd, nh, nw = x.shape[1], x.shape[2], x.shape[3]   # last valid = orig n
        x = jnp.pad(x, [(0, 0)] + [(1, 1)] * 3 + [(0, 0)])
    else:
        nd, nh, nw = x.shape[1] - 1, x.shape[2] - 1, x.shape[3] - 1
    bsz, di, hi, wi, k = x.shape
    n = w.shape[-1]
    do, ho, wo = di - 1, hi - 1, wi - 1
    if do < 1 or ho < th or wo < 8 or k % 128 or n % 128:
        return None
    wo_k = -(-wo // 8) * 8
    wi_k = -(-(wo_k + 1) // 8) * 8
    ho_k = -(-ho // th) * th
    hi_k = ho_k + 1
    if hi_k != hi or wi_k != wi:
        x = jnp.pad(x, [(0, 0), (0, 0), (0, hi_k - hi), (0, wi_k - wi), (0, 0)])
    out = _k2_gn_valid_pallas(x, w, arow, brow, th, wo_k, mode, (nd, nh, nw))
    if ho_k != ho or wo_k != wo:
        out = out[:, :, :ho, :wo, :]
    return out


def _k2_impl(x, w, pad: int, th: int, concat: bool | None = None):
    """Dense k2 conv with symmetric spatial zero ``pad`` (0 or 1) through the
    Pallas kernel, padding H/W up to the kernel's tiling requirements
    (W band 8-aligned for the DMA, output rows th-aligned) and slicing the
    result back. Falls back to XLA conv_general for shapes the kernel does
    not handle (tiny spatial dims)."""
    if concat is None:
        concat = CONCAT_DEFAULT
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
    out = _k2_valid_pallas(x, w, th, wo_k, concat)
    if ho_k != ho or wo_k != wo:
        out = out[:, :, :ho, :wo, :]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def k2_conv(x, w, pad: int = 0, th: int = 8):
    """Dense k2 conv with symmetric spatial zero ``pad`` through the Pallas
    kernel (see :func:`_k2_impl` for the tiling contract and XLA fallback).

    Differentiable: the custom VJP's residuals are the UNPADDED operands —
    the SAME/alignment pads are recomputed in the backward instead of saved
    (the round-2 padded-x residual cost more HBM traffic than it avoided) —
    and dx is itself a k2 conv (full correlation = pad-1 conv with taps
    flipped, channels swapped), so it rides the same Pallas kernel."""
    return _k2_impl(x, w, pad, th)


def _k2_fwd(x, w, pad, th):
    return _k2_impl(x, w, pad, th), (x, w)


def _k2_bwd(pad, th, res, g):
    x, w = res
    bsz, di, hi, wi, k = x.shape
    g = g.astype(x.dtype)
    # dx: 'full' correlation = pad-1 k2 conv with taps flipped, channels
    # swapped — the same compute shape as the forward, so it goes through the
    # Pallas kernel too (output channels k, input channels n, both of which
    # met the alignment check iff the forward did). The outer SAME pad of the
    # forward shrinks dx's extent: slice `pad` back off each side.
    w_rev = w[::-1, ::-1, ::-1].swapaxes(3, 4)
    dx = _k2_impl(g, w_rev, 1, th)
    if pad:
        dx = dx[:, pad:-pad, pad:-pad, pad:-pad, :]
    # dw[t] = sum_spatial x_view_t^T g over the PADDED x (recomputed here —
    # jnp.pad of a live tensor is cheap next to saving it as a residual).
    # (A single batch<->feature-swapped conv formulation measured SLOWER on
    # v5e — 544 vs 519 ms/train-step — so the per-tap contraction stays.)
    if pad:
        x = jnp.pad(x, [(0, 0)] + [(pad, pad)] * 3 + [(0, 0)])
        di, hi, wi = di + 2 * pad, hi + 2 * pad, wi + 2 * pad
    do, ho, wo = di - 1, hi - 1, wi - 1
    taps = []
    for a in (0, 1):
        for bb in (0, 1):
            for c in (0, 1):
                view = lax.slice(x, (0, a, bb, c, 0),
                                 (bsz, do + a, ho + bb, wo + c, k))
                taps.append(jnp.einsum("bdhwk,bdhwn->kn", view, g,
                                       preferred_element_type=jnp.float32))
    dw = jnp.stack(taps).reshape(2, 2, 2, k, w.shape[-1]).astype(w.dtype)
    return dx, dw


k2_conv.defvjp(_k2_fwd, _k2_bwd)
