"""Round-5 conv-engine design bench: logical-FLOP efficiency of candidate
3x3x3 conv formulations at the flagship's hot shapes (v5e, bf16, B=2 eval
tile 64x192x192 equivalents).

Every row reports TF/s on LOGICAL voxel FLOPs (2 * 27 * Ci * Co * out_voxels)
— the reference model's math (unet3D.py:16-35 convs) — regardless of how many
MACs the formulation actually issues, so the numbers are directly comparable
and the FLOP-inflation of blocked forms is priced in:

  mm-ceiling   pure (M,K)@(K,N) matmul at the blocked-conv operand shapes —
               the practical MXU ceiling of this chip (no conv, no gather)
  k2-3ax       current engine: dense k2 conv on the 3-axis s2d block grid
               (8C channels, 64/27 = 2.37x inflation)  [xla | pallas]
  k2-2ax       dense (3,2,2) conv on an (H,W)-blocked grid (4C channels,
               48/27 = 1.78x inflation)                 [xla]
  k2-1ax       dense (3,3,2) conv on a W-blocked grid (2C channels,
               36/27 = 1.33x inflation)                 [xla]
  voxel        plain NDHWC k3 conv (1.0x logical, lane pad 128/C)  [xla]

Usage: python scripts/conv_engine_bench.py [--iters 20] [--cases 32,64,128]
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def timed(fn, args, iters, sync_slice):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(*a):
        x = a[0]

        def body(c, _):
            y = fn(c, *a[1:])
            # renormalized feedback keeps magnitudes stable and chains deps
            c2 = y[tuple(slice(0, s) for s in x.shape)]
            pads = [(0, a_ - b_) for a_, b_ in zip(x.shape, c2.shape)]
            return (jnp.pad(c2, pads) * np.float32(0.1)).astype(x.dtype), ()

        c, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(c.astype(jnp.float32))

    _ = float(loop(*args))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(loop(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from multimodal_pl_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cases", default="32,64,128")
    ap.add_argument("--ths", default="8,16")
    ap.add_argument("--skip_mm", action="store_true")
    ap.add_argument("--skip_pallas", action="store_true")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    B = 2
    _DN = ("NDHWC", "DHWIO", "NDHWC")

    def bf(shape, scale=0.05):
        return jnp.asarray(rng.standard_normal(shape) * scale, jnp.bfloat16)

    def conv(x, w, pad):
        return lax.conv_general_dilated(x, w, (1, 1, 1), pad,
                                        dimension_numbers=_DN)

    # voxel-domain geometry per channel count (flagship stages at B=2 tile):
    #   C=32  -> 64x192x192 (stem/layer0/x1/x2 scale)
    #   C=64  -> 32x96x96   (layer1/x4 scale)
    #   C=128 -> 16x48x48   (layer2/x8 scale)
    geo = {32: (64, 192, 192), 64: (32, 96, 96), 128: (16, 48, 48),
           256: (8, 24, 24)}

    print(f"{'case':28s} {'ms':>8s} {'TF/s(logical)':>14s}", flush=True)

    # --- MXU ceiling: the blocked matmul shapes -------------------------- #
    for m, k, n in () if args.skip_mm else ((2 * 32 * 96 * 96 // 8, 2048, 256),
                    (2 * 32 * 96 * 96, 256, 256),
                    (4096, 4096, 4096)):
        a, b = bf((m, k)), bf((k, n))
        dt = timed(lambda a, b: (a @ b).astype(jnp.bfloat16)[:, :a.shape[-1]]
                   if b.shape[1] >= a.shape[1] else (a @ b), (a, b), args.iters,
                   None)
        fl = 2.0 * m * k * n
        print(f"mm-ceiling {m}x{k}x{n}".ljust(28)
              + f" {dt*1e3:8.2f} {fl/dt/1e12:14.1f}", flush=True)

    for c in map(int, args.cases.split(",")):
        d, h, w_ = geo[c]
        vox = B * d * h * w_
        logical = 2.0 * 27 * c * c * vox

        # voxel k3
        x = bf((B, d, h, w_, c))
        wv = bf((3, 3, 3, c, c))
        dt = timed(lambda x, w: conv(x, w, [(1, 1)] * 3), (x, wv), args.iters, None)
        print(f"voxel   C={c} {d}x{h}x{w_}".ljust(28)
              + f" {dt*1e3:8.2f} {logical/dt/1e12:14.1f}", flush=True)

        # 1-axis (W) blocked: (B, d, h, w/2, 2C), kernel (3, 3, 2, 2C, 2C)
        x1 = bf((B, d, h, w_ // 2, 2 * c))
        w1 = bf((3, 3, 2, 2 * c, 2 * c))
        dt = timed(lambda x, w: conv(x, w, [(1, 1), (1, 1), (1, 0)]),
                   (x1, w1), args.iters, None)
        print(f"k2-1ax  C={c} ({2*c}ch)".ljust(28)
              + f" {dt*1e3:8.2f} {logical/dt/1e12:14.1f}", flush=True)

        # 2-axis (H,W) blocked: (B, d, h/2, w/2, 4C), kernel (3, 2, 2, 4C, 4C)
        x2 = bf((B, d, h // 2, w_ // 2, 4 * c))
        w2 = bf((3, 2, 2, 4 * c, 4 * c))
        dt = timed(lambda x, w: conv(x, w, [(1, 1), (1, 0), (1, 0)]),
                   (x2, w2), args.iters, None)
        print(f"k2-2ax  C={c} ({4*c}ch)".ljust(28)
              + f" {dt*1e3:8.2f} {logical/dt/1e12:14.1f}", flush=True)

        # 3-axis blocked (current engine): (B, d/2, h/2, w/2, 8C), k2 dense
        x3 = bf((B, d // 2, h // 2, w_ // 2, 8 * c))
        w3 = bf((2, 2, 2, 8 * c, 8 * c))
        dt = timed(lambda x, w: conv(x, w, [(1, 0)] * 3), (x3, w3), args.iters, None)
        print(f"k2-3ax  C={c} ({8*c}ch) xla".ljust(28)
              + f" {dt*1e3:8.2f} {logical/dt/1e12:14.1f}", flush=True)

        if not args.skip_pallas:
            from multimodal_pl_tpu.ops.pallas import k2_conv as K

            if 8 * c <= 512:
                dt = timed(functools.partial(K._k2_impl, pad=1, th=8, concat=False),
                           (x3, w3), args.iters, None)
                print(f"k2-3ax  C={c} ({8*c}ch) pallas".ljust(28)
                      + f" {dt*1e3:8.2f} {logical/dt/1e12:14.1f}", flush=True)

            from multimodal_pl_tpu.ops.pallas import bk3_conv as BK

            for th in map(int, args.ths.split(",")):
                if c == 32:
                    xx, ww = x2, w2
                    pads = [(1, 1), (1, 0), (1, 0)]
                elif c == 64:
                    xx, ww = x1, w1
                    pads = [(1, 1), (1, 1), (1, 0)]
                else:
                    xx, ww = x, wv
                    pads = [(1, 1)] * 3
                dt = timed(functools.partial(BK.bk3_impl, pads=pads, th=th),
                           (xx, ww), args.iters, None)
                lbl = {32: "2ax", 64: "1ax", 128: "vox", 256: "vox"}[c]
                print(f"bk3-{lbl} C={c} pallas th{th}".ljust(28)
                      + f" {dt*1e3:8.2f} {logical/dt/1e12:14.1f}", flush=True)


if __name__ == "__main__":
    main()
