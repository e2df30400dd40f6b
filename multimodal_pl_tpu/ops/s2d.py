"""Space-to-depth (factor-2) compute domain for full-resolution 3D stages.

Why: on TPU, NDHWC activations tile as (sublane, lane) = (W, C); the U-Net's
full-resolution stages have C=32, which pads 4x in the 128-wide lane dim and
lowers each 3x3x3 conv tap onto a quarter-empty MXU. Measured on v5e
(bf16, batch 2, 64x192x192): a k3 32->32 conv costs 66.8 ms, while the same
math as a k2 256->256 conv on the 2x2x2-block grid costs 7.8 ms — full lanes,
8 taps instead of 27.

Two block packings of a voxel tensor (B, D, H, W, C), both (B, D/2, H/2, W/2,
8C) with position-major channels (block channel = pos * C + c):

- ALIGNED  ('a'): block m holds voxels {2m, 2m+1}   (plain space_to_depth)
- SHIFTED  ('s'): block m holds voxels {2m-1, 2m}, m = 0..n (n+1 blocks for a
  2n-voxel axis; the two boundary slabs per axis hold out-of-range voxels)

A stride-1 k3 'SAME' voxel conv maps between the packings as a dense k2 conv
with zero data movement — the half-block shift is absorbed into which blocks
the conv window reads (conv lo/hi padding), and one constant 0/1 tap map
assembles the (2,2,2,8ci,8co) kernel from the voxel kernel for BOTH
directions (the map is self-dual):

- aligned -> shifted ("a2s"):  conv padding (1,1) per axis, n -> n+1 blocks
- shifted -> aligned ("s2a"):  conv padding (0,0) per axis, n+1 -> n blocks

so a GN->ReLU->conv->GN->ReLU->conv residual block alternates packings and
never materializes a shuffle. Boundary slabs of a shifted tensor are garbage
(the conv computes them from real edge voxels); they are excluded from
GroupNorm statistics and re-zeroed by `s2d_group_norm(packing='s')` — the
zero is exactly the voxel-domain conv's 'SAME' zero padding, so downstream
convs are exact. A stride-2 k3 conv exits the block domain for free (its
output grid IS the block grid).

All ops are exact reformulations of the reference ops (3x3x3 pad-1 conv of
unet3D.py:16-35, GroupNorm, trilinear x2 upsample of unet3D.py:963-965):
identical multiply-add sets, different grouping. Parity is pinned in
tests/test_s2d.py.
"""

from __future__ import annotations

from contextlib import contextmanager

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NDHWC", "DHWIO", "NDHWC")


def space_to_depth(x: jax.Array) -> jax.Array:
    """(B, D, H, W, C) -> aligned blocks (B, D/2, H/2, W/2, 8C)."""
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(b, d // 2, h // 2, w // 2, 8 * c)


def depth_to_space(x: jax.Array) -> jax.Array:
    """Inverse of :func:`space_to_depth` (aligned packing)."""
    b, d, h, w, c8 = x.shape
    c = c8 // 8
    x = x.reshape(b, d, h, w, 2, 2, 2, c)
    return x.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, 2 * d, 2 * h, 2 * w, c)


def s2d_pack(planes) -> jax.Array:
    """Build an ALIGNED block tensor directly from C single-channel planes
    (each (B, D, H, W)) without materializing the channels-last voxel tensor.

    Why: a full-resolution (B, D, H, W, C) tensor with tiny C (the refiner's
    and discriminator's 2-channel (organ-prob, atlas) inputs, C=2) pads the
    TPU 128-lane minor dim 64x — every read of it costs ~64x its logical
    bytes. The planes themselves are well-tiled (W minor); one fused
    stack+transpose emits the (B, D/2, H/2, W/2, 8C) block tensor
    (position-major channels, = space_to_depth(stack(planes, -1))).
    """
    b, d, h, w = planes[0].shape
    x = jnp.stack(planes, axis=-1)                       # (B, D, H, W, C)
    x = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, len(planes))
    return x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        b, d // 2, h // 2, w // 2, 8 * len(planes))


def space_to_depth_shifted(x: jax.Array) -> jax.Array:
    """Voxel tensor -> SHIFTED packing (zero boundary slabs). Test/entry
    helper; inside the network shifted tensors are produced by a2s convs."""
    return space_to_depth(jnp.pad(x, [(0, 0)] + [(1, 1)] * 3 + [(0, 0)]))


def depth_to_space_shifted(x: jax.Array) -> jax.Array:
    """SHIFTED packing -> voxel tensor (boundary slabs dropped)."""
    v = depth_to_space(x)
    return v[:, 1:-1, 1:-1, 1:-1, :]


def _tap_map_s1() -> np.ndarray:
    """T[k, p, m, s]: kernel tap k for output slot p reads window block m,
    slot s (per axis; self-dual for a2s and s2a, see module docstring)."""
    t = np.zeros((3, 2, 2, 2), np.float32)
    for k in range(3):
        for p in range(2):
            r = p + k  # voxel index within the 4-voxel k2 window
            t[k, p, r // 2, r % 2] = 1.0
    return t


def _tap_map_s2(packing: str) -> np.ndarray:
    """Stride-2 tap map. From SHIFTED input the window is blocks {j, j+1} =
    voxels 2j-1..2j+2 (tap k at window voxel k); from ALIGNED input with conv
    lo-padding 1 the window covers voxels 2j-2..2j+1 (tap k at window voxel
    k+1)."""
    t = np.zeros((3, 2, 2), np.float32)
    for k in range(3):
        r = k if packing == "s" else k + 1
        t[k, r // 2, r % 2] = 1.0
    return t


_TT_S1 = None  # cached combined (27, 512) 0/1 tap map


def _combined_tap_map_s1() -> np.ndarray:
    """TT[(a,b,c), (m,n,l,s,t,u,p,q,r)]: voxel tap -> (block tap, in-slot,
    out-slot) placement, the 3-axis product of _tap_map_s1 flattened to one
    (27, 512) constant so kernel assembly is ONE tiny matmul instead of three
    chained tiny-dim dot_generals (measured ~6 ms/conv of pure overhead on
    v5e — more than the conv itself)."""
    global _TT_S1
    if _TT_S1 is None:
        t = _tap_map_s1()  # (3, 2, 2, 2) [k, p, m, s]
        tt = np.einsum("apms,bqnt,crlu->abcmnlstupqr", t, t, t)
        _TT_S1 = np.ascontiguousarray(tt.reshape(27, 512), np.float32)
    return _TT_S1


def assemble_kernel_s1(w: jax.Array) -> jax.Array:
    """(3,3,3,ci,co) -> (2,2,2,8ci,8co) block-domain kernel (stride 1; used
    for both a2s and s2a directions)."""
    ci, co = w.shape[3], w.shape[4]
    tt = jnp.asarray(_combined_tap_map_s1(), w.dtype)
    # (512, 27) @ (27, ci*co) -> (m,n,l,s,t,u,p,q,r, i, o)
    wp = (tt.T @ w.reshape(27, ci * co)).reshape(2, 2, 2, 2, 2, 2, 2, 2, 2, ci, co)
    # -> (m, n, l, (s,t,u,i), (p,q,r,o))
    wp = wp.transpose(0, 1, 2, 3, 4, 5, 9, 6, 7, 8, 10)
    return wp.reshape(2, 2, 2, 8 * ci, 8 * co)


def _tap_map_k4s2() -> np.ndarray:
    """k4 stride-2 pad-1 conv from ALIGNED blocks (discriminator pyramid
    stems). Output voxel j reads voxels 2j-1..2j+2 = window blocks j-1..j+1
    (k3 on the block grid, pad (1,1)): tap k sits at block (2j-1+k)//2 - j + 1,
    slot (2j-1+k) % 2."""
    t = np.zeros((4, 3, 2), np.float32)
    for k in range(4):
        v = k - 1  # voxel offset relative to 2j
        t[k, (v + 2) // 2, (v + 2) % 2] = 1.0
    return t


def _combined_strided_map(t: np.ndarray) -> np.ndarray:
    """(k, m, s) per-axis tap map -> flat ((k^3), (m^3 * 8)) 0/1 constant
    (same one-matmul assembly trick as _combined_tap_map_s1)."""
    tt = np.einsum("ams,bnt,clu->abcmnlstu", t, t, t)
    k, m = t.shape[0], t.shape[1]
    return np.ascontiguousarray(tt.reshape(k ** 3, m ** 3 * 8), np.float32)


_TT_K4S2 = None


def assemble_kernel_k4s2(w: jax.Array) -> jax.Array:
    """(4,4,4,ci,co) voxel kernel -> (3,3,3,8ci,co) aligned-block stride-2
    kernel (half-resolution voxel output)."""
    global _TT_K4S2
    if _TT_K4S2 is None:
        _TT_K4S2 = _combined_strided_map(_tap_map_k4s2())
    ci, co = w.shape[3], w.shape[4]
    tt = jnp.asarray(_TT_K4S2, w.dtype)
    wp = (tt.T @ w.reshape(64, ci * co)).reshape(3, 3, 3, 2, 2, 2, ci, co)
    return wp.reshape(3, 3, 3, 8 * ci, co)


def s2d_conv4x4(xb: jax.Array, w: jax.Array, bias: jax.Array | None = None) -> jax.Array:
    """Exact k4 stride-2 pad-1 voxel conv computed on ALIGNED blocks:
    (B, n1, n2, n3, 8ci) -> (B, n1, n2, n3, co) half-resolution voxel tensor."""
    wp = assemble_kernel_k4s2(w).astype(xb.dtype)
    out = lax.conv_general_dilated(xb, wp, (1, 1, 1), [(1, 1)] * 3,
                                   dimension_numbers=_DN)
    if bias is not None:
        out = out + bias
    return out


_TT_S2 = {}


def assemble_kernel_s2(w: jax.Array, packing: str = "s") -> jax.Array:
    """(3,3,3,ci,co) -> (2,2,2,8ci,co) stride-2 kernel (block input ->
    half-resolution voxel output)."""
    if packing not in _TT_S2:
        _TT_S2[packing] = _combined_strided_map(_tap_map_s2(packing))
    ci, co = w.shape[3], w.shape[4]
    tt = jnp.asarray(_TT_S2[packing], w.dtype)
    wp = (tt.T @ w.reshape(27, ci * co)).reshape(2, 2, 2, 2, 2, 2, ci, co)
    return wp.reshape(2, 2, 2, 8 * ci, co)


# Alternative stride-1 k2 lowering: explicit im2col (concat 8 shifted views,
# one K=8*8ci matmul). The matmul alone hits 113 TFLOP/s vs conv_general's 80
# on v5e, but MATERIALIZING the 8x view tensor costs more than the matmul
# saves (13.6 vs 7.8 ms end-to-end at the 256ch (32,96,96) grid), so
# conv_general stays the default; the im2col path is kept for the Pallas
# fused-gather variant to compare against.
_K2_IM2COL = False

# Pallas fused-gather k2 kernel (ops/pallas/k2_conv.py): forms the 8 shifted
# views in VMEM, capturing the im2col matmul win without the HBM
# materialization. Trace-time switch like norm.set_fused_gn_relu; enabled via
# StepConfig.pallas_k2 / --pallas_k2.
_K2_PALLAS = False


def set_k2_pallas(enabled: bool) -> None:
    global _K2_PALLAS
    _K2_PALLAS = bool(enabled)


def k2_pallas_enabled() -> bool:
    return _K2_PALLAS


# Fused GN->ReLU->k2 Pallas kernel (ops/pallas/k2_conv.py k2_gn_conv): the
# group statistics are computed in XLA (one read of x) and the normalize +
# ReLU + boundary masking ride the conv kernel's input path in VMEM — the
# normalized activation tensor is never materialized in HBM. Inference-only
# (no VJP), enabled by mpl-evaluate/bench alongside --pallas_k2.
_K2_FUSED_GN = False


def set_k2_fused_gn(enabled: bool) -> None:
    global _K2_FUSED_GN
    _K2_FUSED_GN = bool(enabled)


def k2_fused_gn_enabled() -> bool:
    return _K2_FUSED_GN


@contextmanager
def pallas_inference_scope(k2: bool = True, fused_gn: bool = True):
    """Trace-time scope routing k2 convs through the inference-only Pallas
    paths for a gradient-free subgraph.

    The train step's no-grad refiner complement pass (train_amos_atlas_final
    .py:289-290 — its output feeds the loss only through stop_gradient) never
    runs a VJP, so it can take the same fused GN->ReLU->k2 kernels the
    evaluator uses even while the surrounding step is differentiated.

    Assumes a SINGLE-THREADED trace: the scope flips module-level globals for
    its dynamic extent, so any concurrent trace (async predictor compile) or a
    remat/nn.checkpoint wrapper that re-traces the refiner OUTSIDE this scope
    would pick up the wrong kernel routing. If the refiner ever gains remat
    support, thread these flags through config instead of globals.
    """
    global _K2_PALLAS, _K2_FUSED_GN
    prev = (_K2_PALLAS, _K2_FUSED_GN)
    _K2_PALLAS, _K2_FUSED_GN = bool(k2), bool(fused_gn)
    try:
        yield
    finally:
        _K2_PALLAS, _K2_FUSED_GN = prev


def _k2_conv_im2col(xb: jax.Array, wp: jax.Array, pad: int) -> jax.Array:
    """k2 stride-1 conv as ONE matmul: concatenate the 8 shifted views on the
    channel axis (K = 8 * C_in) and contract against the flattened kernel.
    pad: symmetric spatial zero padding (1 for a2s, 0 for s2a)."""
    if pad:
        xb = jnp.pad(xb, [(0, 0)] + [(pad, pad)] * 3 + [(0, 0)])
    b, d, h, w, c = xb.shape
    od, oh, ow = d - 1, h - 1, w - 1
    views = [
        lax.slice(xb, (0, a, b2, c2, 0), (b, od + a, oh + b2, ow + c2, c))
        for a in (0, 1) for b2 in (0, 1) for c2 in (0, 1)
    ]
    xx = jnp.concatenate(views, axis=-1)          # (B, od, oh, ow, 8C)
    return jnp.einsum("bdhwk,ko->bdhwo", xx, wp.reshape(8 * c, -1),
                      preferred_element_type=xb.dtype)


def s2d_conv3x3(xb: jax.Array, w: jax.Array, packing: str,
                stride: int = 1, bias: jax.Array | None = None) -> jax.Array:
    """Exact 3x3x3 pad-1 conv in the block domain; zero data movement.

    packing: the INPUT packing, 'a' (aligned) or 's' (shifted). stride 1
    flips the packing ('a'->'s', 's'->'a'); stride 2 accepts either packing
    and returns a half-resolution voxel tensor. Shifted inputs must have zero
    (or masked-dead) boundary slabs — `s2d_group_norm(packing='s')` and
    `space_to_depth_shifted` guarantee this.
    """
    if stride == 2:
        wp = assemble_kernel_s2(w, packing).astype(xb.dtype)
        pad = [(0, 0)] * 3 if packing == "s" else [(1, 0)] * 3
        out = lax.conv_general_dilated(xb, wp, (1, 1, 1), pad, dimension_numbers=_DN)
    else:
        wp = assemble_kernel_s1(w).astype(xb.dtype)
        if _K2_PALLAS:
            from multimodal_pl_tpu.ops.pallas.k2_conv import k2_conv

            out = k2_conv(xb, wp, pad=1 if packing == "a" else 0)
        elif _K2_IM2COL:
            out = _k2_conv_im2col(xb, wp, 1 if packing == "a" else 0)
        else:
            pad = [(1, 1)] * 3 if packing == "a" else [(0, 0)] * 3
            out = lax.conv_general_dilated(xb, wp, (1, 1, 1), pad,
                                           dimension_numbers=_DN)
    if bias is not None:
        out = out + (jnp.tile(bias, 8) if stride == 1 else bias)
    return out


def s2d_conv1x1(xb: jax.Array, w: jax.Array, packing: str = "a",
                stride: int = 1, bias: jax.Array | None = None) -> jax.Array:
    """1x1x1 conv in the block domain (block-diagonal over positions;
    stride-1 is packing-blind and preserves the input packing).

    stride 2 samples even voxels — slot (0,0,0) of aligned packing, slot
    (1,1,1) of shifted packing — and exits to the half-resolution voxel grid.
    """
    w = w.reshape(w.shape[-2], w.shape[-1])
    b, d, h, wd, c8 = xb.shape
    ci = w.shape[0]
    v = xb.reshape(b, d, h, wd, 8, ci)
    if stride == 2:
        if packing == "a":
            out = v[..., 0, :] @ w  # slot (0,0,0) = even voxels
        else:
            # slot (1,1,1) = even voxels; last block per axis holds voxel 2n
            # (out of range) — drop it
            out = v[:, :-1, :-1, :-1, 7, :] @ w
        if bias is not None:
            out = out + bias
        return out
    out = jnp.einsum("...pi,io->...po", v, w).reshape(b, d, h, wd, 8 * w.shape[1])
    if bias is not None:
        out = out + jnp.tile(bias, 8)
    return out


def _shifted_interior_mask(spatial, dtype) -> jax.Array:
    """(d, h, w, 8, 1) 0/1 mask of in-range voxels of a shifted tensor.

    Per axis, (block 0, slot 0) is voxel -1 and (block n, slot 1) is voxel 2n
    — both out of range. Constant-folded by XLA."""
    axes = []
    for n in spatial:
        m = np.ones((n, 2), np.float32)
        m[0, 0] = 0.0
        m[n - 1, 1] = 0.0
        axes.append(m)
    md, mh, mw = axes
    full = np.einsum("ds,ht,wu->dhwstu", md, mh, mw).reshape(*spatial, 8, 1)
    return jnp.asarray(full, dtype)


def _interior_select(xb: jax.Array, c: int):
    """Boolean interior mask of a SHIFTED block tensor, expressed as fused
    iota comparisons over (spatial, lane) — no materialized mask constant and
    no lane-splitting reshape of the data tensor. Lane ch = pos*C + c with
    pos = (pd, ph, pw); per axis, (block 0, slot 0) and (block n-1, slot 1)
    are out of range."""
    d, h, w = xb.shape[1:4]
    lane = lax.broadcasted_iota(jnp.int32, xb.shape, 4)
    pd = lane // (4 * c)
    ph = (lane // (2 * c)) % 2
    pw = (lane // c) % 2
    di = lax.broadcasted_iota(jnp.int32, xb.shape, 1)
    hi = lax.broadcasted_iota(jnp.int32, xb.shape, 2)
    wi = lax.broadcasted_iota(jnp.int32, xb.shape, 3)
    return (((di > 0) | (pd == 1)) & ((di < d - 1) | (pd == 0))
            & ((hi > 0) | (ph == 1)) & ((hi < h - 1) | (ph == 0))
            & ((wi > 0) | (pw == 1)) & ((wi < w - 1) | (pw == 0)))


def s2d_group_norm(xb: jax.Array, scale: jax.Array, bias: jax.Array,
                   num_groups: int, eps: float = 1e-5,
                   packing: str = "a") -> jax.Array:
    """GroupNorm over the underlying voxel tensor, computed in block packing.

    The 2x2x2 positions are spatial, so statistics reduce over
    (blocks, positions, channels-in-group) — the identical element set as the
    voxel-domain GroupNorm (f32 stats, matching ops/norm.py). For shifted
    packing, the out-of-range boundary slabs are excluded from the statistics
    (two-pass masked moments) and the output is zeroed there, restoring the
    voxel conv's 'SAME' zero padding for the next conv.

    Like ops/norm.group_norm, reductions go per block-channel first (spatial
    axes only — a lane-splitting reshape of the data tensor costs a TPU
    relayout; measured 9.4 -> ~3 ms for the masked form at the 256ch
    (33,97,97) grid) and groups pool on the tiny (B, 8C) partials.
    """
    b = xb.shape[0]
    c8 = xb.shape[-1]
    c = c8 // 8
    cpg = c // num_groups
    spatial = xb.shape[1:4]
    scale_b = jnp.tile(scale, 8).astype(xb.dtype)
    bias_b = jnp.tile(bias, 8).astype(xb.dtype)
    bshape = (b, 1, 1, 1, c8)

    def expand(g):  # (b, G) group stats -> (b, 1, 1, 1, 8C) broadcast rows
        return jnp.tile(jnp.repeat(g, cpg, axis=-1), (1, 8)).reshape(bshape)

    def pool(cs):  # (b, 8C) channel partials -> (b, G)
        return cs.reshape(b, 8, num_groups, cpg).sum(axis=(1, 3))

    xf = xb.astype(jnp.float32)
    if packing == "s":
        interior = _interior_select(xb, c)
        n_true = float(np.prod([2 * (s - 1) for s in spatial])) * cpg
        xm = jnp.where(interior, xf, 0.0)
        gmean = pool(jnp.sum(xm, axis=(1, 2, 3))) / n_true
        dev = jnp.where(interior, xf - expand(gmean), 0.0)
        gvar = pool(jnp.sum(jnp.square(dev), axis=(1, 2, 3))) / n_true
        v = (dev * expand(lax.rsqrt(gvar + eps))).astype(xb.dtype)
        return jnp.where(interior, v * scale_b + bias_b, jnp.zeros((), xb.dtype))
    n_tot = float(np.prod(spatial)) * 8 * cpg  # blocks * positions * cpg
    gmean = pool(jnp.sum(xf, axis=(1, 2, 3))) / n_tot
    dev = xf - expand(gmean)
    gvar = pool(jnp.sum(jnp.square(dev), axis=(1, 2, 3))) / n_tot
    v = (dev * expand(lax.rsqrt(gvar + eps))).astype(xb.dtype)
    return v * scale_b + bias_b


def _s2d_gn_fold(xb: jax.Array, scale: jax.Array, bias: jax.Array,
                 num_groups: int, eps: float, packing: str):
    """Group statistics of :func:`s2d_group_norm`, folded into per-(sample,
    block-channel) affine rows A, B (f32, shape (B, 1, 8C)) such that
    normalize(x) * scale + bias == x * A + B. One read of xb; the normalize
    itself is applied downstream (inside the fused conv kernel)."""
    b = xb.shape[0]
    c8 = xb.shape[-1]
    c = c8 // 8
    cpg = c // num_groups
    spatial = xb.shape[1:4]

    def expand(g):  # (b, G) -> (b, 8C)
        return jnp.tile(jnp.repeat(g, cpg, axis=-1), (1, 8))

    def pool(cs):  # (b, 8C) -> (b, G)
        return cs.reshape(b, 8, num_groups, cpg).sum(axis=(1, 3))

    xf = xb.astype(jnp.float32)
    if packing == "s":
        interior = _interior_select(xb, c)
        n_true = float(np.prod([2 * (s - 1) for s in spatial])) * cpg
        xm = jnp.where(interior, xf, 0.0)
        gmean = pool(jnp.sum(xm, axis=(1, 2, 3))) / n_true
        dev = jnp.where(interior, xf - expand(gmean)[:, None, None, None, :], 0.0)
        gvar = pool(jnp.sum(jnp.square(dev), axis=(1, 2, 3))) / n_true
    else:
        n_tot = float(np.prod(spatial)) * 8 * cpg
        gmean = pool(jnp.sum(xf, axis=(1, 2, 3))) / n_tot
        dev = xf - expand(gmean)[:, None, None, None, :]
        gvar = pool(jnp.sum(jnp.square(dev), axis=(1, 2, 3))) / n_tot
    inv = expand(lax.rsqrt(gvar + eps))                 # (b, 8C)
    mean = expand(gmean)
    sc = jnp.tile(scale.astype(jnp.float32), 8)[None]   # (1, 8C)
    bi = jnp.tile(bias.astype(jnp.float32), 8)[None]
    arow = inv * sc
    brow = bi - mean * arow
    return arow[:, None, :], brow[:, None, :]           # (b, 1, 8C)


def s2d_gn_relu_conv3x3(xb: jax.Array, arow: jax.Array, brow: jax.Array,
                        w: jax.Array, packing: str) -> jax.Array:
    """relu(group_norm(xb)) -> stride-1 k3 conv, with the normalize fused
    into the Pallas k2 kernel's input path (never materialized in HBM).

    (arow, brow) is the statistics fold from :func:`_s2d_gn_fold`; ``w`` is
    the (optionally pre-standardized) voxel kernel. Exact same math as
    s2d_group_norm -> relu -> s2d_conv3x3 (the in-kernel mask reproduces
    both the shifted boundary zeroing and the conv SAME padding); falls back
    to the unfused composition off the kernel's tiling contract."""
    from multimodal_pl_tpu.ops.pallas.k2_conv import k2_gn_conv

    wp = assemble_kernel_s1(w).astype(xb.dtype)
    out = k2_gn_conv(xb, wp, arow, brow, mode=packing)
    if out is None:
        t = jnp.maximum(xb.astype(jnp.float32) * arow[:, 0][:, None, None, None, :]
                        + brow[:, 0][:, None, None, None, :], 0.0).astype(xb.dtype)
        if packing == "s":
            t = jnp.where(_interior_select(xb, xb.shape[-1] // 8), t,
                          jnp.zeros((), xb.dtype))
        return s2d_conv3x3(t, w, packing=packing, stride=1)
    return out


def s2d_upsample_trilinear(x: jax.Array, packing: str = "a") -> jax.Array:
    """x2 trilinear upsample (align_corners=False, clamped edges) emitted
    directly as a block tensor — no full-resolution intermediate.

    packing='a': (B, n1, n2, n3, C) -> aligned (B, n1, n2, n3, 8C).
    packing='s': -> shifted (B, n1+1, n2+1, n3+1, 8C) with ZERO boundary
    slabs (ready for an s2a conv).

    Per axis, output parity 0 sits at source position j - 0.25 and parity 1
    at j + 0.25, each an elementwise blend of the source with its
    edge-clamped shift. Matches ops/resize.upsample_trilinear
    (reference unet3D.py:963-965).
    """
    v = x
    for ax in range(1, 4):
        n = v.shape[ax]
        first = lax.slice_in_dim(v, 0, 1, axis=ax)
        last = lax.slice_in_dim(v, n - 1, n, axis=ax)
        lo = jnp.concatenate([first, lax.slice_in_dim(v, 0, n - 1, axis=ax)], axis=ax)
        hi = jnp.concatenate([lax.slice_in_dim(v, 1, n, axis=ax), last], axis=ax)
        p0 = 0.25 * lo + 0.75 * v
        p1 = 0.75 * v + 0.25 * hi
        if packing == "s":
            # shifted block m = voxels {2m-1, 2m}: slot0 = parity1 at m-1
            z = jnp.zeros_like(lax.slice_in_dim(p1, 0, 1, axis=ax))
            s0 = jnp.concatenate([z, p1], axis=ax)
            s1 = jnp.concatenate([p0, z], axis=ax)
            v = jnp.stack([s0, s1], axis=3 + ax)
        else:
            v = jnp.stack([p0, p1], axis=3 + ax)
    b, d, h, w = v.shape[0], v.shape[1], v.shape[2], v.shape[3]
    return v.reshape(b, d, h, w, 8 * x.shape[-1])
