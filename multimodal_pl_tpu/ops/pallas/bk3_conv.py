"""Generalized blocked-3x3x3 conv band kernel (the round-5 conv engine).

The model's 3x3x3 convs (reference unet3D.py:16-35) are lowered per stage
onto the layout that fills the TPU's 128-wide lane dim with the FEWEST extra
MACs (PERF.md round-5 conv-engine bench):

  C >= 128 : plain voxel NDHWC, per-axis taps (3,3,3) — tap-exact, 1.00x
  C == 64  : W-axis 2-blocked, 2C=128 lanes, taps (3,3,2)  — 36/27 = 1.33x
  C == 32  : (H,W) 2-blocked, 4C=128 lanes, taps (3,2,2)   — 48/27 = 1.78x

(The round-1..4 engine blocked ALL three axes for C=32, inflating 64/27 =
2.37x; blocking an axis turns its k3 into a dense k2 over blocks = 4 MACs
per voxel instead of 3, so each blocked axis costs 4/3.)

Kernel structure (the part that reaches matmul-rate): each grid step DMAs one
(td, BH, WB, K) input band HBM->VMEM double-buffered and treats each depth
slab as a FLAT (BH*WB, K) row tensor — row-major (h, w) flattening makes
every (kh, kw) tap view a plain row slice at offset kh*WB + kw. The kernel
only takes the 8-aligned kh*WB slices (zero-copy, WB is 8-aligned) and folds
the kw shift into the accumulator instead: the tkw per-axis W taps are
CONCATENATED along the matmul N dim (weights prepacked as
(td, tkh, K, tkw*N)), every (kd, kh) pair is ONE MXU matmul into a single
f32 accumulator, and the final combine sums the accumulator's kw column
blocks at row offset kw (tkw-1 shifted adds) before compacting WB -> wo
columns. Versus the round-3 k2_conv.py kernel this removes all per-view
VMEM compactions (measured: the gap between its ~80 TF/s and the ~113 TF/s
pure-matmul rate) at the cost of ~WB/wo extra matmul rows.

Wrapper-level jnp.pads express the callers' SAME / packing-shift paddings,
exactly as ops/pallas/k2_conv.py does for the 3-axis form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DN = ("NDHWC", "DHWIO", "NDHWC")


def _kernel(x_hbm, w_ref, out_ref, xs, acc, sems, *, taps, th: int, wo: int,
            wb: int):
    """One grid step: output rows [h*th, (h+1)*th) x [0, wo) of depth d,
    batch b.

    xs: (2, BH*WB + 8, td*K) flat bands, double-buffered — the td depth-tap
    slabs are DMA'd into SEPARATE 128-lane column blocks, so the depth taps
    sit in the matmul K dimension and accumulate INSIDE the MXU (measured:
    the f32 accumulator read-modify-write of one-matmul-per-tap was the
    kernel bottleneck, not DMA). acc: (th*WB + 8, tkw*N) f32."""
    td, tkh, tkw = taps
    b = pl.program_id(0)
    d = pl.program_id(1)
    h = pl.program_id(2)
    nd = pl.num_programs(1)
    nh = pl.num_programs(2)
    k = x_hbm.shape[-1]
    n = out_ref.shape[-1]
    i = (b * nd + d) * nh + h
    n_steps = pl.num_programs(0) * nd * nh
    slot = jax.lax.rem(i, 2)
    band_h = th + tkh - 1
    m_v = th * wb + 8  # view rows: th*WB plus one sublane tile of slack

    def band_dma(to_slot, kd, bb, dd, hh):
        # x_hbm is (B, D, H*WB, K); depth slab dd+kd -> lane block kd.
        return pltpu.make_async_copy(
            x_hbm.at[bb, dd + kd, pl.ds(hh * th * wb, band_h * wb)],
            xs.at[to_slot, pl.ds(0, band_h * wb),
                  pl.ds(kd * k, k)], sems.at[to_slot, kd])

    @pl.when(i == 0)
    def _():
        for kd in range(td):
            band_dma(0, kd, b, d, h).start()

    @pl.when(i + 1 < n_steps)
    def _():
        i1 = i + 1
        h1 = jax.lax.rem(i1, nh)
        t = jax.lax.div(i1, nh)
        for kd in range(td):
            band_dma(jax.lax.rem(i1, 2), kd, jax.lax.div(t, nd),
                     jax.lax.rem(t, nd), h1).start()

    for kd in range(td):
        band_dma(slot, kd, b, d, h).wait()

    first = True
    for kh in range(tkh):
        view = xs[slot, pl.ds(kh * wb, m_v), :]     # (m_v, td*K), 8-aligned
        mm = jax.lax.dot_general(
            view, w_ref[kh],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if first:
            acc[...] = mm
            first = False
        else:
            acc[...] += mm

    # combine the kw column blocks at row offset kw, then compact WB -> wo
    s = acc[0:th * wb, 0:n]
    for kw in range(1, tkw):
        s = s + acc[kw:th * wb + kw, kw * n:(kw + 1) * n]
    out_ref[0, 0] = (
        s.reshape(th, wb, n)[:, 0:wo, :].reshape(th * wo, n)
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("taps", "th", "wo"))
def _bk3_valid_pallas(x, w, taps, th: int, wo: int):
    """VALID conv with per-axis extents ``taps``; output extents
    (Di-td+1, Hi-th_+1, wo). Tiling contract (caller guarantees): Wi (=WB)
    8-aligned, wo <= Wi - 1, wo + tkw - 1 <= Wi, (Hi - tkh + 1) % th == 0.
    w comes in voxel layout (td, tkh, tkw, K, N) and is N-concatenated over
    kw here."""
    td, tkh, tkw = taps
    bsz, di, hi, wb, k = x.shape
    n = w.shape[-1]
    do, ho = di - td + 1, hi - tkh + 1
    nh = ho // th
    band_h = th + tkh - 1

    # (td, tkh, tkw, K, N) -> (tkh, td*K, tkw*N): depth taps concatenated
    # along the contraction dim (matching the lane-blocked band layout),
    # W taps along N.
    w_cat = jnp.transpose(w, (1, 0, 3, 2, 4)).reshape(tkh, td * k, tkw * n)
    xf = x.reshape(bsz, di, hi * wb, k)

    out = pl.pallas_call(
        functools.partial(_kernel, taps=taps, th=th, wo=wo, wb=wb),
        grid=(bsz, do, nh),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),     # full kernel
        ],
        out_specs=pl.BlockSpec((1, 1, th * wo, n),
                               lambda b, d, h: (b, d, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, do, ho * wo, n), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, band_h * wb + 8, td * k), x.dtype),
            pltpu.VMEM((th * wb + 8, tkw * n), jnp.float32),
            pltpu.SemaphoreType.DMA((2, td)),
        ],
        interpret=jax.default_backend() != "tpu",
    )(xf, w_cat)
    return out.reshape(bsz, do, ho, wo, n)


def _bk3_valid_xla(x, w):
    return lax.conv_general_dilated(x, w, (1, 1, 1), [(0, 0)] * 3,
                                    dimension_numbers=_DN)


def bk3_impl(x, w, pads, th: int = 16):
    """Blocked-k3 conv with per-axis (lo, hi) zero ``pads`` through the band
    kernel, padding H/W up to the tiling contract and slicing back. Falls
    back to XLA conv_general off-contract (tiny dims, unaligned channels)."""
    td, tkh, tkw = w.shape[0], w.shape[1], w.shape[2]
    if any(tuple(p) != (0, 0) for p in pads):
        x = jnp.pad(x, [(0, 0)] + [tuple(p) for p in pads] + [(0, 0)])
    bsz, di, hi, wi, k = x.shape
    n = w.shape[-1]
    do, ho, wo = di - td + 1, hi - tkh + 1, wi - tkw + 1
    if do < 1 or ho < 8 or wo < 8 or k % 128 or n % 128:
        return _bk3_valid_xla(x, w)
    ho_k = -(-ho // th) * th
    # WB: 8-aligned band width with wb >= wi and wb >= wo + 2 (so the two
    # rightmost band columns — which can read one stale scratch row through
    # the kw-shifted accumulator combine — are garbage output columns that
    # the in-kernel WB->wo compaction drops)
    wb = -(-(wo + 2) // 8) * 8
    if ho_k + tkh - 1 != hi or wb != wi:
        x = jnp.pad(x, [(0, 0), (0, 0), (0, ho_k + tkh - 1 - hi),
                        (0, wb - wi), (0, 0)])
    out = _bk3_valid_pallas(x, w, (td, tkh, tkw), th, wo)
    if ho_k != ho:
        out = out[:, :, :ho]
    return out
