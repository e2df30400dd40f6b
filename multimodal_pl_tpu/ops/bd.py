"""Mixed-axis block domain: per-stage layouts that fill the TPU 128-lane dim
with the FEWEST extra MACs (the round-5 conv engine; supersedes the 3-axis
space-to-depth domain of ops/s2d.py for the hot stages).

A stage of channel width C runs on the layout that brings its lane dim to
exactly 128 (PERF.md round-5 conv-engine bench):

  C >= 128 : plain voxel NDHWC        — 3x3x3 convs tap-exact (1.00x MACs)
  C == 64  : W-axis 2-blocked (2C)    — per-axis taps (3,3,2), 36/27 = 1.33x
  C == 32  : H,W 2-blocked (4C)       — per-axis taps (3,2,2), 48/27 = 1.78x

Blocked axes use the aligned/shifted packing alternation of ops/s2d.py
(module docstring there): a stride-1 k3 voxel conv is a dense k2 conv over
blocks that FLIPS the packing with zero data movement, so consecutive convs
never pay a repack; the boundary slabs of a shifted tensor are excluded from
GroupNorm statistics and re-zeroed (restoring the voxel conv's 'SAME' zero
padding exactly). Voxel axes take explicit 'SAME' zero pads instead — XLA
fuses the pad into the producing GN/ReLU pass, and the band kernel
(ops/pallas/bk3_conv.py) runs the conv itself at near-matmul rate.

Blocked-tensor lane order is position-major: lane = pos_h * (2C) + pos_w * C
+ c for hw-blocking, pos_w * C + c for w-blocking (matches ops/s2d.py).

All ops are exact reformulations of the reference ops (3x3x3 pad-1 conv of
unet3D.py:16-35, GroupNorm, trilinear x2 upsample of unet3D.py:963-965):
identical multiply-add sets, different grouping. Parity pinned in
tests/test_bd.py.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from multimodal_pl_tpu.ops.s2d import _tap_map_s1, _tap_map_s2

_DN = ("NDHWC", "DHWIO", "NDHWC")

# blocked-axis specs per channel width: True = 2-blocked, order (D, H, W)
BLOCKED = {32: (False, True, True), 64: (False, False, True)}


def blocked_for(c: int):
    """Blocking spec for a stage of channel width c (identity for c >= 128)."""
    return BLOCKED.get(c, (False, False, False))


def factors(blocked):
    return tuple(2 if b else 1 for b in blocked)


def pack(x: jax.Array, blocked) -> jax.Array:
    """Voxel (B, D, H, W, C) -> ALIGNED blocked tensor; blocked axes must be
    even. Lane order position-major over the blocked axes in (D, H, W) order."""
    b, d, h, w, c = x.shape
    fd, fh, fw = factors(blocked)
    x = x.reshape(b, d // fd, fd, h // fh, fh, w // fw, fw, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, d // fd, h // fh, w // fw, fd * fh * fw * c)


def unpack(x: jax.Array, blocked) -> jax.Array:
    """Inverse of :func:`pack` (aligned packing)."""
    b, d, h, w, cf = x.shape
    fd, fh, fw = factors(blocked)
    c = cf // (fd * fh * fw)
    x = x.reshape(b, d, h, w, fd, fh, fw, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, d * fd, h * fh, w * fw, c)


def pack_shifted(x: jax.Array, blocked) -> jax.Array:
    """Voxel tensor -> SHIFTED packing on the blocked axes (zero boundary
    slabs). Entry/test helper; in-network shifted tensors come from convs."""
    pads = [(0, 0)] + [(1, 1) if b else (0, 0) for b in blocked] + [(0, 0)]
    return pack(jnp.pad(x, pads), blocked)


def unpack_shifted(x: jax.Array, blocked) -> jax.Array:
    """SHIFTED blocked tensor -> voxel tensor (boundary slabs dropped)."""
    v = unpack(x, blocked)
    sl = [slice(None)] + [slice(1, -1) if b else slice(None) for b in blocked]
    return v[tuple(sl)]


# --------------------------------------------------------------------------- #
# kernel assembly: voxel (3,3,3,ci,co) -> per-layout band kernels
# --------------------------------------------------------------------------- #

_ASM_CACHE: dict = {}


def _axis_maps(blocked, stride: int, packing: str):
    """Per-axis tap maps A[k, m, s, p]: voxel tap k of a conv from this axis's
    layout reads block/voxel offset m, input slot s, writing output slot p."""
    maps = []
    for b in blocked:
        if stride == 1:
            if b:
                t = _tap_map_s1()                       # (3, 2, 2, 2) [k,p,m,s]
                maps.append(np.transpose(t, (0, 2, 3, 1)))  # -> [k, m, s, p]
            else:
                maps.append(np.eye(3, dtype=np.float32).reshape(3, 3, 1, 1))
        else:  # stride 2: output is the half-resolution voxel grid (p dim 1)
            if b:
                t = _tap_map_s2(packing)                # (3, m, s)
                maps.append(t.reshape(3, t.shape[1], 2, 1))
            else:
                # voxel axis stride-2 handled by conv window stride; tap k at
                # window offset m = k (SAME pad handled by caller pads)
                maps.append(np.eye(3, dtype=np.float32).reshape(3, 3, 1, 1))
    return maps


def assemble_kernel(w: jax.Array, blocked, stride: int = 1,
                    packing: str = "a") -> jax.Array:
    """(3,3,3,ci,co) voxel kernel -> blocked band kernel
    (md, mh, mw, S*ci, P*co), position-major slots (matching :func:`pack`)."""
    ci, co = w.shape[3], w.shape[4]
    ad, ah, aw = _axis_maps(blocked, stride, packing)
    # combined map TT[(ka kb kc), (md sd pd mh sh ph mw sw pw)] via einsum of
    # the three per-axis maps; arranged (md mh mw sd sh sw pd ph pw)
    key = (tuple(bool(b) for b in blocked), stride, packing)
    cache_key = ("TT",) + key
    if cache_key not in _ASM_CACHE:
        tt = np.einsum("admp,behq,cfkr->abcdefmhkpqr", ad, ah, aw)
        # dims: a,b,c = voxel taps; d,e,f = m_d,m_h,m_w; m,h,k = s_d,s_h,s_w;
        # p,q,r = p_d,p_h,p_w
        k3 = tt.shape[0] * tt.shape[1] * tt.shape[2]
        rest = tt.reshape(k3, -1)
        _ASM_CACHE[cache_key] = (np.ascontiguousarray(rest, np.float32),
                                 tt.shape)
    rest, shp = _ASM_CACHE[cache_key]
    tt = jnp.asarray(rest, w.dtype)
    md, mh, mw = shp[3], shp[4], shp[5]
    sd, sh, sw = shp[6], shp[7], shp[8]
    pd, ph, pw = shp[9], shp[10], shp[11]
    wp = (tt.T @ w.reshape(27, ci * co)).reshape(
        md, mh, mw, sd, sh, sw, pd, ph, pw, ci, co)
    # -> (md, mh, mw, (sd sh sw ci), (pd ph pw co))
    wp = wp.transpose(0, 1, 2, 3, 4, 5, 9, 6, 7, 8, 10)
    return wp.reshape(md, mh, mw, sd * sh * sw * ci, pd * ph * pw * co)


# --------------------------------------------------------------------------- #
# conv / norm / upsample on mixed-axis layouts
# --------------------------------------------------------------------------- #


def bd_conv3x3(xb: jax.Array, w: jax.Array, blocked, packing: str,
               stride: int = 1, bias: jax.Array | None = None,
               use_pallas: bool | None = None) -> jax.Array:
    """Exact 3x3x3 pad-1 voxel conv on a blocked tensor.

    packing: the INPUT packing on the blocked axes ('a' | 's'); stride 1
    flips it, stride 2 exits to the half-resolution voxel grid. Voxel axes
    take explicit SAME pads. Shifted inputs must have zero (or masked-dead)
    boundary slabs (`bd_group_norm(packing='s')` guarantees this).
    """
    from multimodal_pl_tpu.ops.pallas.bk3_conv import bk3_impl

    fd, fh, fw = factors(blocked)
    wp = assemble_kernel(w, blocked, stride=stride, packing=packing)
    wp = wp.astype(xb.dtype)
    if stride == 2:
        # blocked axes exit the block domain for free (output grid = block
        # grid); voxel axes stride through the conv window.
        pads = []
        strides = []
        for b in blocked:
            if b:
                pads.append((0, 0) if packing == "s" else (1, 0))
                strides.append(1)
            else:
                pads.append((1, 1))
                strides.append(2)
        out = lax.conv_general_dilated(xb, wp, tuple(strides), pads,
                                       dimension_numbers=_DN)
    else:
        pads = [(1, 1) if (not b or packing == "a") else (0, 0)
                for b in blocked]
        if use_pallas is None:
            use_pallas = bd_pallas_enabled()
        if xb.shape[-1] < 32:
            # tiny-K convs (the 4-lane stem): XLA's conv lowering runs ~16x
            # off bandwidth here (measured 6.4 ms for ~0.3 GB of traffic);
            # an explicit im2col concat + one matmul is bandwidth-bound
            out = _conv_im2col(xb, wp, pads)
        elif use_pallas:
            out = bk3_impl(xb, wp, pads)
        else:
            out = lax.conv_general_dilated(xb, wp, (1, 1, 1), pads,
                                           dimension_numbers=_DN)
    if bias is not None:
        reps = (fd * fh * fw) if stride == 1 else 1
        out = out + (jnp.tile(bias, reps) if reps > 1 else bias)
    return out


def _conv_im2col(xb: jax.Array, wp: jax.Array, pads) -> jax.Array:
    """Small-K conv as one matmul vs the taps concatenated along K."""
    td, tkh, tkw, k, n = wp.shape
    x = jnp.pad(xb, [(0, 0)] + [tuple(p) for p in pads] + [(0, 0)])
    b, d, h, w_, _ = x.shape
    od, oh, ow = d - td + 1, h - tkh + 1, w_ - tkw + 1
    views = [
        lax.slice(x, (0, a, b2, c2, 0), (b, od + a, oh + b2, ow + c2, k))
        for a in range(td) for b2 in range(tkh) for c2 in range(tkw)
    ]
    xx = jnp.concatenate(views, axis=-1)
    return jnp.einsum("bdhwk,ko->bdhwo", xx,
                      wp.transpose(0, 1, 2, 3, 4).reshape(td * tkh * tkw * k, n),
                      preferred_element_type=xb.dtype)


def bd_conv1x1(xb: jax.Array, w: jax.Array, blocked, packing: str = "a",
               stride: int = 1, bias: jax.Array | None = None) -> jax.Array:
    """1x1x1 conv on a blocked tensor (block-diagonal over positions;
    stride 1 preserves the packing). stride 2 samples even voxels and exits
    to the half-resolution voxel grid."""
    w = w.reshape(w.shape[-2], w.shape[-1])
    b, d, h, wd, cf = xb.shape
    f = int(np.prod(factors(blocked)))
    ci = w.shape[0]
    v = xb.reshape(b, d, h, wd, f, ci)
    if stride == 2:
        # even voxels: aligned -> slot 0 on each blocked axis; shifted ->
        # slot 1 (and drop the last block per blocked axis); voxel axes
        # subsample with a stride-2 slice.
        slot = 0
        for bax in blocked:
            if bax:
                slot = slot * 2 + (1 if packing == "s" else 0)
        sl = [slice(None)]
        for bax in blocked:
            if bax and packing == "s":
                sl.append(slice(None, -1))
            elif bax:
                sl.append(slice(None))
            else:
                sl.append(slice(None, None, 2))
        v = v[tuple(sl)]
        out = v[..., slot, :] @ w
        if bias is not None:
            out = out + bias
        return out
    out = jnp.einsum("...pi,io->...po", v, w)
    out = out.reshape(b, d, h, wd, f * w.shape[1])
    if bias is not None:
        out = out + jnp.tile(bias, f)
    return out


def _interior_select_bd(xb: jax.Array, c: int, blocked):
    """Boolean interior mask of a SHIFTED blocked tensor (blocked axes only),
    as fused iota comparisons — generalization of s2d._interior_select."""
    fd, fh, fw = factors(blocked)
    lane = lax.broadcasted_iota(jnp.int32, xb.shape, 4)
    pd = lane // (fh * fw * c)
    ph = (lane // (fw * c)) % fh
    pw = (lane // c) % fw
    cond = None
    for ax, (b, p) in enumerate(zip(blocked, (pd, ph, pw)), start=1):
        if not b:
            continue
        n = xb.shape[ax]
        ai = lax.broadcasted_iota(jnp.int32, xb.shape, ax)
        m = ((ai > 0) | (p == 1)) & ((ai < n - 1) | (p == 0))
        cond = m if cond is None else (cond & m)
    return cond


def bd_group_norm(xb: jax.Array, scale: jax.Array, bias: jax.Array,
                  num_groups: int, eps: float = 1e-5, blocked=(False,) * 3,
                  packing: str = "a", relu: bool = False) -> jax.Array:
    """GroupNorm over the underlying voxel tensor, computed in blocked
    layout (f32 stats, identical element sets as ops/norm.group_norm). For
    shifted packing, the dead boundary slabs of the blocked axes are
    excluded from the statistics and the output is re-zeroed there."""
    b = xb.shape[0]
    f = int(np.prod(factors(blocked)))
    cf = xb.shape[-1]
    c = cf // f
    cpg = c // num_groups
    spatial = xb.shape[1:4]
    scale_b = jnp.tile(scale, f).astype(xb.dtype)
    bias_b = jnp.tile(bias, f).astype(xb.dtype)
    bshape = (b, 1, 1, 1, cf)

    def expand(g):  # (b, G) -> broadcast rows
        return jnp.tile(jnp.repeat(g, cpg, axis=-1), (1, f)).reshape(bshape)

    def pool(cs):  # (b, f*C) -> (b, G)
        return cs.reshape(b, f, num_groups, cpg).sum(axis=(1, 3))

    xf = xb.astype(jnp.float32)
    if packing == "s" and any(blocked):
        interior = _interior_select_bd(xb, c, blocked)
        n_vox = 1.0
        for ax, bl in enumerate(blocked, start=1):
            n_vox *= 2 * (xb.shape[ax] - 1) if bl else xb.shape[ax]
        n_true = n_vox * cpg
        xm = jnp.where(interior, xf, 0.0)
        gmean = pool(jnp.sum(xm, axis=(1, 2, 3))) / n_true
        dev = jnp.where(interior, xf - expand(gmean), 0.0)
        gvar = pool(jnp.sum(jnp.square(dev), axis=(1, 2, 3))) / n_true
        v = (dev * expand(lax.rsqrt(gvar + eps))).astype(xb.dtype)
        v = v * scale_b + bias_b
        if relu:
            v = jnp.maximum(v, 0)
        return jnp.where(interior, v, jnp.zeros((), xb.dtype))
    n_tot = float(np.prod(spatial)) * f * cpg
    gmean = pool(jnp.sum(xf, axis=(1, 2, 3))) / n_tot
    dev = xf - expand(gmean)
    gvar = pool(jnp.sum(jnp.square(dev), axis=(1, 2, 3))) / n_tot
    v = (dev * expand(lax.rsqrt(gvar + eps))).astype(xb.dtype)
    v = v * scale_b + bias_b
    return jnp.maximum(v, 0) if relu else v


def bd_upsample_trilinear(x: jax.Array, blocked, packing: str = "s") -> jax.Array:
    """x2 trilinear upsample (align_corners=False, clamped edges) of a VOXEL
    tensor, emitted directly in the target blocked layout — no full-
    resolution voxel intermediate on the blocked axes.

    Blocked output axes follow ops/s2d.s2d_upsample_trilinear ('s' packing
    has ZERO boundary slabs, ready for an s->a conv); voxel output axes are
    plain interleaves. Matches ops/resize.upsample_trilinear."""
    v = x
    pos_dims = []
    for ax in range(1, 4):
        n = v.shape[ax]
        first = lax.slice_in_dim(v, 0, 1, axis=ax)
        last = lax.slice_in_dim(v, n - 1, n, axis=ax)
        lo = jnp.concatenate([first, lax.slice_in_dim(v, 0, n - 1, axis=ax)], axis=ax)
        hi = jnp.concatenate([lax.slice_in_dim(v, 1, n, axis=ax), last], axis=ax)
        p0 = 0.25 * lo + 0.75 * v
        p1 = 0.75 * v + 0.25 * hi
        if blocked[ax - 1]:
            if packing == "s":
                z = jnp.zeros_like(lax.slice_in_dim(p1, 0, 1, axis=ax))
                s0 = jnp.concatenate([z, p1], axis=ax)
                s1 = jnp.concatenate([p0, z], axis=ax)
                v = jnp.stack([s0, s1], axis=3 + len(pos_dims) + 1)
            else:
                v = jnp.stack([p0, p1], axis=3 + len(pos_dims) + 1)
            pos_dims.append(ax)
        else:
            # interleave parities along the voxel axis itself
            st = jnp.stack([p0, p1], axis=ax + 1)
            shp = list(v.shape)
            shp[ax] = 2 * v.shape[ax]
            v = st.reshape(shp)
    if not pos_dims:
        return v
    # merge position dims (inserted after the 3 spatial dims, in axis order)
    b, d, h, w = v.shape[0], v.shape[1], v.shape[2], v.shape[3]
    return v.reshape(b, d, h, w, -1)


# --------------------------------------------------------------------------- #
# trace-time gate (mirrors s2d's _K2_PALLAS switch)
# --------------------------------------------------------------------------- #

_BD_PALLAS = False


def set_bd_pallas(enabled: bool) -> None:
    global _BD_PALLAS
    _BD_PALLAS = bool(enabled)


def bd_pallas_enabled() -> bool:
    return _BD_PALLAS


# --------------------------------------------------------------------------- #
# fused inference path: canvas helpers + folded GN statistics (ops/pallas/bdx)
# --------------------------------------------------------------------------- #

_BD_FUSED = False


def set_bd_fused(enabled: bool) -> None:
    global _BD_FUSED
    _BD_FUSED = bool(enabled)


def bd_fused_enabled() -> bool:
    return _BD_FUSED


def chain_wb(ws_max: int) -> int:
    """Canvas width for a conv chain whose widest stored W extent is ws_max:
    halo col + extents + slack. 16-aligned: every scratch/DMA sublane offset
    in the bdx kernel is a multiple of wb, and bf16 buffers tile sublanes in
    16s — a wb ≡ 8 (mod 16) puts DMA destinations on half-tile offsets,
    which wedges the device (observed INTERNAL crash at wb=24/104; wb=16
    fine)."""
    return -(-(ws_max + 3) // 16) * 16


def to_canvas(xb: jax.Array, wb: int, th: int = 16) -> jax.Array:
    """Plain blocked tensor (B, D, Hs, Ws, K) -> bdx canvas
    (B, D, Hc*wb, K): W left halo col + right garbage, H garbage tail
    (2 extra row tiles beyond any consumer's reach)."""
    b, d, hs, ws, k = xb.shape
    hc = (-(-(hs + 2) // th) + 2) * th
    c = jnp.pad(xb, [(0, 0), (0, 0), (0, hc - hs), (1, wb - ws - 1), (0, 0)])
    return c.reshape(b, d, hc * wb, k)


def from_canvas(c: jax.Array, true_h: int, true_w: int, wb: int) -> jax.Array:
    """bdx canvas -> plain blocked tensor (B, D, true_h, true_w, K)."""
    b, d, flat, k = c.shape
    v = c.reshape(b, d, flat // wb, wb, k)
    return v[:, :, :true_h, 1:1 + true_w, :]


def _fold_rows(gmean, gvar, scale, bias, num_groups, eps, f, c):
    """(b, G) stats -> per-lane affine rows a, b of shape (B, f*C) f32 with
    normalize(x)*scale+bias == x*a + b."""
    cpg = c // num_groups

    def expand(g):
        return jnp.tile(jnp.repeat(g, cpg, axis=-1), (1, f))

    inv = expand(lax.rsqrt(gvar + eps))
    mean = expand(gmean)
    sc = jnp.tile(scale.astype(jnp.float32), f)[None]
    bi = jnp.tile(bias.astype(jnp.float32), f)[None]
    arow = inv * sc
    brow = bi - mean * arow
    return arow, brow


def bd_gn_fold(xb: jax.Array, scale: jax.Array, bias: jax.Array,
               num_groups: int, eps: float = 1e-5, blocked=(False,) * 3,
               packing: str = "a"):
    """Folded group statistics of a PLAIN blocked tensor (one read of xb):
    the masked-stat core of :func:`bd_group_norm` returning (arow, brow)
    lane rows instead of normalizing."""
    b = xb.shape[0]
    f = int(np.prod(factors(blocked)))
    c = xb.shape[-1] // f
    cpg = c // num_groups

    def pool(cs):
        return cs.reshape(b, f, num_groups, cpg).sum(axis=(1, 3))

    xf = xb.astype(jnp.float32)
    if packing == "s" and any(blocked):
        interior = _interior_select_bd(xb, c, blocked)
        n_vox = 1.0
        for ax, bl in enumerate(blocked, start=1):
            n_vox *= 2 * (xb.shape[ax] - 1) if bl else xb.shape[ax]
        n_true = n_vox * cpg
        xm = jnp.where(interior, xf, 0.0)
        gmean = pool(jnp.sum(xm, axis=(1, 2, 3))) / n_true
        dev = jnp.where(interior,
                        xf - jnp.tile(jnp.repeat(gmean, cpg, -1), (1, f))[
                            :, None, None, None, :], 0.0)
        gvar = pool(jnp.sum(jnp.square(dev), axis=(1, 2, 3))) / n_true
    else:
        n_tot = float(np.prod(xb.shape[1:4])) * f * cpg
        gmean = pool(jnp.sum(xf, axis=(1, 2, 3))) / n_tot
        dev = xf - jnp.tile(jnp.repeat(gmean, cpg, -1), (1, f))[
            :, None, None, None, :]
        gvar = pool(jnp.sum(jnp.square(dev), axis=(1, 2, 3))) / n_tot
    return _fold_rows(gmean, gvar, scale, bias, num_groups, eps, f, c)


def bd_gn_fold_canvas(c_t: jax.Array, scale: jax.Array, bias: jax.Array,
                      num_groups: int, true_dims, wb: int,
                      eps: float = 1e-5, blocked=(False,) * 3,
                      packing: str = "a"):
    """Folded group statistics computed directly on a bdx CANVAS tensor
    (garbage regions excluded by coordinate masks — one read, no
    from_canvas materialization)."""
    b, d_st, flat, k = c_t.shape
    f = int(np.prod(factors(blocked)))
    c = k // f
    cpg = c // num_groups
    fd, fh, fw = factors(blocked)
    nd, nh, nw = true_dims

    rows = lax.broadcasted_iota(jnp.int32, (1, 1, flat, 1), 2)
    lanes = lax.broadcasted_iota(jnp.int32, (1, 1, 1, k), 3)
    p_h = (lanes // (fw * c)) % fh
    p_w = (lanes // c) % fw
    h_in = rows // wb
    w_in = rows % wb - 1
    if packing == "s" and fh == 2:
        hmask = (h_in + p_h >= 1) & (h_in + p_h <= nh - 1)
    else:
        hmask = (h_in >= 0) & (h_in < nh)
    if packing == "s" and fw == 2:
        wmask = (w_in + p_w >= 1) & (w_in + p_w <= nw - 1)
    else:
        wmask = (w_in >= 0) & (w_in < nw)
    valid = hmask & wmask

    def pool(cs):
        return cs.reshape(b, f, num_groups, cpg).sum(axis=(1, 3))

    # valid VOXEL counts per axis (positions included), matching the
    # bd_group_norm element sets
    n_h = 2 * (nh - 1) if (packing == "s" and fh == 2) else nh * fh
    n_w = 2 * (nw - 1) if (packing == "s" and fw == 2) else nw * fw
    n_true = float(nd) * n_h * n_w * cpg

    xf = c_t.astype(jnp.float32)
    xm = jnp.where(valid, xf, 0.0)
    gmean = pool(jnp.sum(xm, axis=(1, 2))) / n_true
    dev = jnp.where(valid,
                    xf - jnp.tile(jnp.repeat(gmean, cpg, -1), (1, f))[
                        :, None, None, :], 0.0)
    gvar = pool(jnp.sum(jnp.square(dev), axis=(1, 2))) / n_true
    return _fold_rows(gmean, gvar, scale, bias, num_groups, eps, f, c)


def bd_gn_relu_conv3x3(x_or_canvas, arow, brow, w, blocked, packing,
                       true_dims, wb: int, th: int = 16, res=None):
    """relu(masked group_norm) -> stride-1 k3 conv, fused in the bdx band
    kernel; x_or_canvas must already be a canvas (see to_canvas). Optional
    ``res``: a same-convention canvas added to the output INSIDE the kernel
    (the residual shortcut). Returns the OUTPUT canvas, or None
    off-contract."""
    from multimodal_pl_tpu.ops.pallas.bdx import bdx_gn_conv

    wp = assemble_kernel(w, blocked, stride=1).astype(x_or_canvas.dtype)
    _, fh, fw = factors(blocked)
    modes = tuple("v" if not bl else packing for bl in blocked)
    return bdx_gn_conv(x_or_canvas, wp, arow, brow, modes=modes,
                       true_dims=true_dims, factors=(fh, fw), th=th, wb=wb,
                       res=res)
