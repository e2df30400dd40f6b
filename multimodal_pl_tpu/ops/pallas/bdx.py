"""Fused masked-GN -> ReLU -> blocked-k3 conv band kernel (inference path of
the round-5 mixed-axis conv engine, ops/bd.py).

Why: the unfused composition pays full-HBM passes between every op — GN
writes the normalized tensor, jnp.pad copies it again (pads cannot fuse into
an opaque pallas call), the conv reads it back. At the full-resolution stage
(~300 MB activations) each pass costs ~0.4 ms, which swamps the conv-engine
win. This kernel removes ALL of them: it reads the RAW (un-normalized,
un-padded) tensor, applies the folded group statistics + ReLU + validity
masking on the DMA'd band in VMEM, and runs the blocked conv at the
bk3_conv.py matmul-rate structure (depth taps lane-concatenated into K, W
taps N-concatenated, shifted-accumulator combine).

Pad-free mechanics (per axis of the (D, H, W) band geometry):

  D (voxel SAME): tap kd reads slab d+kd-1, CLAMPED to [0, D); the
     out-of-range slab's lane block is zeroed by the validity mask — exactly
     the conv's zero padding.
  H  : no halo. Each band issues a HEAD DMA (the single row-block h*th-1,
     clamped at 0) plus a BODY DMA; tap kh's view starts at scratch row
     (kh + o_h + 1)*WB, always >= 0 (o_h = -1 for voxel/aligned H, 0 for
     shifted H). Masked by the h-coordinate validity.
  W  : canvas convention — column 0 is a halo column, logical W unit u lives
     at canvas column u+1, columns >= 1+true_w are garbage; WB is 8-aligned
     and >= true_w + 4. Tap kw's contribution rides the accumulator combine
     at row offset kw, wrap-reads land in masked garbage columns, and the
     kernel writes its OUTPUT in the same convention (one in-VMEM column
     roll), so canvases chain conv-to-conv with zero repacks.

Canvas contract (ops/bd.py to_canvas/from_canvas): flat row layout
(B, D, Hc*WB, K) with Hc = out-row tiles + one garbage tile; every garbage
region (halo col, cols >= 1+true_w, rows >= true_h, clamped D slabs) may
hold ARBITRARY values — validity is coordinate-based, never value-based.

Blocked axes ('a'/'s' packing, ops/s2d.py convention) differ from voxel axes
only in tap count (2 vs 3), the H view offset, and the slot-aware 's' mask
(block i, slot p valid iff 1 <= i+p <= n_stored-2+p... i.e. the boundary
slabs (0, slot 0) and (n_stored-1, slot 1) are dead). Forward-only by design
(mirrors k2_conv.k2_gn_conv): training keeps the unfused path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, a_ref, b_ref, *rest, taps, modes, true_dims,
            factors, ch: int, th: int, wb: int, scratch_rows: int,
            has_res: bool):
    if has_res:
        res_ref, out_ref, xs, acc, sems = rest
    else:
        out_ref, xs, acc, sems = rest
        res_ref = None
    td, tkh, tkw = taps
    md, mh, mw_ = modes
    nd, nh, nw = true_dims
    fh, fw = factors
    b = pl.program_id(0)
    d = pl.program_id(1)
    h = pl.program_id(2)
    nd_g = pl.num_programs(1)
    nh_g = pl.num_programs(2)
    k = x_hbm.shape[-1]
    n = out_ref.shape[-1]
    i = (b * nd_g + d) * nh_g + h
    n_steps = pl.num_programs(0) * nd_g * nh_g
    slot = jax.lax.rem(i, 2)
    o_d = 0 if md == "s" else -1
    o_h = 0 if mh == "s" else -1
    m_v = th * wb + 8
    body_rows = scratch_rows - wb

    def dmas(to_slot, bb, dd, hh):
        out = []
        for kd in range(td):
            sl = jnp.clip(dd + kd + o_d, 0, x_hbm.shape[1] - 1)
            head = jnp.maximum(hh * th - 1, 0) * wb
            out.append(pltpu.make_async_copy(
                x_hbm.at[bb, sl, pl.ds(head, wb)],
                xs.at[to_slot, pl.ds(0, wb), pl.ds(kd * k, k)],
                sems.at[to_slot, kd, 0]))
            out.append(pltpu.make_async_copy(
                x_hbm.at[bb, sl, pl.ds(hh * th * wb, body_rows)],
                xs.at[to_slot, pl.ds(wb, body_rows), pl.ds(kd * k, k)],
                sems.at[to_slot, kd, 1]))
        return out

    @pl.when(i == 0)
    def _():
        for c in dmas(0, b, d, h):
            c.start()

    @pl.when(i + 1 < n_steps)
    def _():
        i1 = i + 1
        h1 = jax.lax.rem(i1, nh_g)
        t = jax.lax.div(i1, nh_g)
        for c in dmas(jax.lax.rem(i1, 2), jax.lax.div(t, nd_g),
                      jax.lax.rem(t, nd_g), h1):
            c.start()

    for c in dmas(slot, b, d, h):
        c.wait()

    # ---- masked normalize + ReLU on the whole band ---------------------- #
    # 3-D (row-block, col, lane) view of the band: the H/W coordinates come
    # from plain iotas — row//wb and row%wb on the flat view would be
    # non-power-of-2 div/mod, which Mosaic miscompiles at runtime (observed:
    # device-wedging INTERNAL error at wb=104; pow-of-2 wb geometries fine).
    nrb = scratch_rows // wb
    x = xs[slot, pl.ds(0, nrb * wb), :].reshape(nrb, wb, td * k)
    x = x.astype(jnp.float32)
    av = a_ref[0, 0][None]
    bv = b_ref[0, 0][None]
    q = lax.broadcasted_iota(jnp.int32, x.shape, 0)
    col = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    lanes = lax.broadcasted_iota(jnp.int32, x.shape, 2)
    kd_l = lanes // k                                    # k: power of 2
    rem = lanes - kd_l * k
    p_h = (rem // (fw * ch)) % fh                        # ch: power of 2
    p_w = (rem // ch) % fw
    h_in = h * th - 1 + q
    w_in = col - 1
    d_in = d + kd_l + o_d
    valid = (d_in >= 0) & (d_in < nd)
    if mh == "s":
        valid &= (h_in + p_h >= 1) & (h_in + p_h <= nh - 1)
    else:
        valid &= (h_in >= 0) & (h_in < nh)
    if mw_ == "s":
        valid &= (w_in + p_w >= 1) & (w_in + p_w <= nw - 1)
    else:
        valid &= (w_in >= 0) & (w_in < nw)
    t = jnp.maximum(x * av + bv, 0.0)
    xs[slot, pl.ds(0, nrb * wb), :] = jnp.where(valid, t, 0.0).astype(
        xs.dtype).reshape(nrb * wb, td * k)

    # ---- matmuls: one per H tap, K = td*k lanes, N = tkw*n --------------- #
    first = True
    for kh in range(tkh):
        view = xs[slot, pl.ds((kh + o_h + 1) * wb, m_v), :]
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

    # ---- kw combine + output column roll into halo convention ----------- #
    # out col u takes tap kw from input canvas col u + kw + o_w:
    #   'v'/'a': logical in w = u + kw - 1 (halo absorbs the -1), o_w = 0
    #   's'    : out aligned u reads stored blocks u + kw, o_w = +1
    o_w = 1 if mw_ == "s" else 0
    s = acc[o_w:th * wb + o_w, 0:n]
    for kw in range(1, tkw):
        s = s + acc[kw + o_w:th * wb + kw + o_w, kw * n:(kw + 1) * n]
    v = s.reshape(th, wb, n)
    v = jnp.concatenate([v[:, :1, :], v[:, :wb - 1, :]], axis=1)  # col u -> u+1
    v = v.reshape(th * wb, n)
    if res_ref is not None:
        # fused residual: res is a same-convention canvas of the block input,
        # pipelined in per-tile by the BlockSpec — saves the separate XLA
        # residual add's 3 full-HBM passes
        v = v + res_ref[0, 0].astype(jnp.float32)
    out_ref[0, 0] = v.astype(out_ref.dtype)


def out_extent(n_stored: int, mode: str) -> int:
    """Output valid extent of a stride-1 conv along one axis, given the
    input's stored extent and axis mode."""
    if mode == "v":
        return n_stored          # SAME
    if mode == "a":
        return n_stored + 1      # a -> s grows by one block
    return n_stored - 1          # s -> a drops the boundary block


@functools.partial(jax.jit, static_argnames=("taps", "modes", "true_dims",
                                             "factors", "th", "wb"))
def _bdx_call(x, w_cat, arow, brow, res, taps, modes, true_dims, factors,
              th: int, wb: int):
    td, tkh, tkw = taps
    bsz, d_stored, flat, k = x.shape
    n = w_cat.shape[-1] // tkw
    d_out = out_extent(true_dims[0], modes[0]) if modes[0] != "v" else d_stored
    h_out = out_extent(true_dims[1], modes[1])
    nh_g = -(-h_out // th)
    o_h = 0 if modes[1] == "s" else -1
    # full multiple of wb: the whole band goes through the masked transform
    # (and its 3-D row-block view), slack rows included
    scratch_rows = (tkh + o_h + 2 + th) * wb
    # TWO garbage tail tiles: a successor conv's H extent can GROW by one
    # block ('a' -> 's'), pushing its out_rows one tile past ours, and its
    # last band's body DMA reads up to (tkh + o_h) <= 3 rows beyond that —
    # one tile of margin under-provisions exactly there (observed: device-
    # fault INTERNAL crash on the chain's second conv at layer0 geometry).
    out_tiles = nh_g + 2

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, td * k), lambda b, d, h: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, td * k), lambda b, d, h: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, w_cat, arow, brow]
    if res is not None:
        in_specs.append(pl.BlockSpec((1, 1, th * wb, n),
                                     lambda b, d, h: (b, d, h, 0),
                                     memory_space=pltpu.VMEM))
        args.append(res)

    out = pl.pallas_call(
        functools.partial(_kernel, taps=taps, modes=modes,
                          true_dims=true_dims, factors=factors,
                          ch=k // (factors[0] * factors[1]), th=th, wb=wb,
                          scratch_rows=scratch_rows, has_res=res is not None),
        grid=(bsz, d_out, nh_g),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, th * wb, n),
                               lambda b, d, h: (b, d, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, d_out, out_tiles * th * wb, n),
                                       x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, scratch_rows, td * k), x.dtype),
            pltpu.VMEM((th * wb + 8, tkw * n), jnp.float32),
            pltpu.SemaphoreType.DMA((2, td, 2)),
        ],
        interpret=jax.default_backend() != "tpu",
    )(*args)
    return out


def bdx_gn_conv(x, w_cat, arow, brow, *, modes, true_dims, factors,
                th: int = 16, wb: int, res=None):
    """relu(masked_group_norm(x)) -> blocked k3 conv, fully fused, on canvas
    tensors (see module docstring for the contract).

    x: (B, D_stored, Hc*wb, K) canvas. w_cat: assembled blocked kernel
    (td, tkh, tkw, K, N) — N-concatenation over kw and K-concatenation over
    kd happen here. arow/brow: (B, K) f32 folded group statistics rows
    (bd._bd_gn_fold). Returns the output canvas (B, D_out, Ho_c*wb, N);
    output packing flips on blocked axes. Returns None if the geometry
    falls off the kernel contract (caller takes the unfused path)."""
    td, tkh, tkw = w_cat.shape[0], w_cat.shape[1], w_cat.shape[2]
    k, n = w_cat.shape[3], w_cat.shape[4]
    if k % 128 or n % 128 or wb % 8 or true_dims[2] + 2 > wb:
        return None
    if modes[0] != "v":
        return None  # D blocking unused by the bd layouts
    # (td, tkh, tkw, K, N) -> (tkh, td*K, tkw*N)
    wc = jnp.transpose(w_cat, (1, 0, 3, 2, 4)).reshape(tkh, td * k, tkw * n)
    ar = jnp.tile(arow.astype(jnp.float32), (1, td))[:, None, :]
    br = jnp.tile(brow.astype(jnp.float32), (1, td))[:, None, :]
    return _bdx_call(x, wc, ar, br, res, (td, tkh, tkw), tuple(modes),
                     tuple(int(v) for v in true_dims), tuple(factors),
                     th, wb)
