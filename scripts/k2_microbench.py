"""Op-level A/B of the dense k2 block conv lowerings on the real chip.

Times, loop-in-jit with sequential dependence (PERF.md methodology — single
shots through the axon tunnel are meaningless), at the production full-res
block-domain shape (B=2, 32x96x96 blocks, 256ch bf16):

  xla        lax.conv_general_dilated, pad 1
  acc8:thN   Pallas fused-gather, 8 accumulating K=256 matmuls
  conc:thN   Pallas fused-gather, single K=2048 matmul vs the VMEM-
             concatenated shifted views (im2col without HBM materialization)

Usage: python scripts/k2_microbench.py [--iters 30] [--shape 2,32,96,96,256]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_pl_tpu.ops.pallas import k2_conv as K


def timed(fn, x, w, iters: int, label: str, flops: float, ref=None):
    # loop-in-jit: feed output back through a cheap projection to chain deps
    @jax.jit
    def loop(x, w):
        def body(c, _):
            y = fn(c, w)
            # renormalized feedback keeps magnitudes stable across iters
            c2 = y[..., : x.shape[-1]] * (1.0 / np.sqrt(x.shape[-1]))
            c2 = c2[:, : x.shape[1], : x.shape[2], : x.shape[3], :]
            pads = [(0, a - b) for a, b in zip(x.shape, c2.shape)]
            return jnp.pad(c2, pads).astype(x.dtype), ()

        c, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(c.astype(jnp.float32))

    _ = float(loop(x, w))  # compile
    t0 = time.perf_counter()
    s = float(loop(x, w))
    dt = (time.perf_counter() - t0) / iters
    out = fn(x, w)
    line = f"{label:10s} {dt * 1e3:7.2f} ms  {flops / dt / 1e12:6.1f} TF/s(dense)"
    if ref is not None:
        rel = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)) /
                    (jnp.max(jnp.abs(ref)) + 1e-9))
        line += f"  maxrel {rel:.2e}"
    print(line, flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--shape", default="2,32,96,96,256")
    ap.add_argument("--ths", default="8,16")
    args = ap.parse_args()
    b, d, h, w_, c = map(int, args.shape.split(","))

    from multimodal_pl_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, d, h, w_, c)), jnp.bfloat16)
    wgt = jnp.asarray(rng.standard_normal((2, 2, 2, c, c)) / np.sqrt(8 * c),
                      jnp.bfloat16)
    # dense-form FLOPs of the SAME-padded conv (output == input extent)
    flops = 2.0 * b * d * h * w_ * 8 * c * c

    ref = timed(lambda x, w: K._k2_valid_xla(
        jnp.pad(x, [(0, 0)] + [(1, 1)] * 3 + [(0, 0)]), w),
        x, wgt, args.iters, "xla", flops).astype(jnp.float32)

    for th in map(int, args.ths.split(",")):
        timed(functools.partial(K._k2_impl, pad=1, th=th, concat=False),
              x, wgt, args.iters, f"acc8:th{th}", flops, ref)
        timed(functools.partial(K._k2_impl, pad=1, th=th, concat=True),
              x, wgt, args.iters, f"conc:th{th}", flops, ref)


if __name__ == "__main__":
    main()
