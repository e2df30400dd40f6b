"""Flagship eval-forward A/B on the real chip: XLA vs pallas_k2 vs fused-GN.

Times the UNet3DFEAM inference forward (the sliding-window tile program,
batch 2 x 64x192x192 bf16 — PERF.md round-2/3 A/B config) loop-in-jit with
sequential dependence, plus an op-level A/B of the fused GN->ReLU->k2 conv
against its unfused composition at the production full-res block grid.

Usage: python scripts/eval_forward_bench.py [--iters 10] [--op_only|--fwd_only]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x))


def time_loop(make_step, x0, iters):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(x):
        def body(c, _):
            return make_step(c), ()

        c, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(c.astype(jnp.float32))

    _ = float(loop(x0))  # compile
    t0 = time.perf_counter()
    _ = float(loop(x0))
    return (time.perf_counter() - t0) / iters


def op_ab(iters: int):
    import jax
    import jax.numpy as jnp

    from multimodal_pl_tpu.ops import s2d

    rng = np.random.default_rng(0)
    # production full-res block grid of the 64x192x192 tile at batch 2:
    # shifted (33, 97, 97, 256) -> conv1 -> aligned (32, 96, 96, 256)
    xb = jnp.asarray(rng.standard_normal((2, 33, 97, 97, 256)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 32, 32)) * 0.1, jnp.bfloat16)
    scale = jnp.ones((32,), jnp.float32)
    bias = jnp.zeros((32,), jnp.float32)

    def unfused(c):
        y = s2d.s2d_group_norm(c, scale, bias, 16, packing="s")
        y = jax.nn.relu(y)
        out = s2d.s2d_conv3x3(y, w, packing="s", stride=1)  # (2,32,96,96,256)
        return jnp.pad(out, [(0, 0), (0, 1), (0, 1), (0, 1), (0, 0)]).astype(c.dtype)

    def fused(c):
        arow, brow = s2d._s2d_gn_fold(c, scale, bias, 16, 1e-5, "s")
        out = s2d.s2d_gn_relu_conv3x3(c, arow, brow, w, "s")
        return jnp.pad(out, [(0, 0), (0, 1), (0, 1), (0, 1), (0, 0)]).astype(c.dtype)

    for label, enable_pallas in (("xla-conv", False), ("pallas-k2", True)):
        s2d.set_k2_pallas(enable_pallas)
        try:
            dt = time_loop(unfused, xb, iters)
            print(f"op unfused gn->relu->conv1 [{label}]: {dt*1e3:7.2f} ms")
        finally:
            s2d.set_k2_pallas(False)
    dt = time_loop(fused, xb, iters)
    print(f"op FUSED  gn->relu->conv1 [pallas]:   {dt*1e3:7.2f} ms")


def fwd_ab(iters: int):
    import jax
    import jax.numpy as jnp

    from multimodal_pl_tpu.models import UNet3DFEAM, init_class_tokens
    from multimodal_pl_tpu.ops import s2d

    NC = 14
    model = UNet3DFEAM(num_classes=NC, weight_std=True, deep_up=True)
    tokens = init_class_tokens(jax.random.PRNGKey(1), NC)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 16, 32, 32, 1)), tokens)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((2, 64, 192, 192, 1)), jnp.bfloat16)

    def step(c):
        logits = model.apply(params, c, tokens)[0]
        # cheap feedback: collapse classes back to one input channel
        return jnp.tanh(jnp.mean(logits, -1, keepdims=True)).astype(c.dtype)

    for label, k2, gn in (("xla", False, False),
                          ("pallas_k2", True, False),
                          ("pallas_k2+fused_gn", True, True)):
        s2d.set_k2_pallas(k2)
        s2d.set_k2_fused_gn(gn)
        try:
            dt = time_loop(step, x0, iters)
            print(f"flagship eval fwd (B=2 64x192x192 bf16) [{label}]: {dt*1e3:7.1f} ms")
        finally:
            s2d.set_k2_pallas(False)
            s2d.set_k2_fused_gn(False)

    # round-5 mixed-axis engine (ops/bd.py)
    from multimodal_pl_tpu.ops import bd

    model_bd = UNet3DFEAM(num_classes=NC, weight_std=True, deep_up=True, bd=True)

    def step_bd(c):
        logits = model_bd.apply(params, c, tokens)[0]
        return jnp.tanh(jnp.mean(logits, -1, keepdims=True)).astype(c.dtype)

    for label, pal, fus in (("bd-xla", False, False), ("bd-pallas", True, False),
                            ("bd-pallas+fused", True, True)):
        bd.set_bd_pallas(pal)
        bd.set_bd_fused(fus)
        try:
            dt = time_loop(step_bd, x0, iters)
            print(f"flagship eval fwd (B=2 64x192x192 bf16) [{label}]: {dt*1e3:7.1f} ms")
        finally:
            bd.set_bd_pallas(False)
            bd.set_bd_fused(False)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--op_only", action="store_true")
    ap.add_argument("--fwd_only", action="store_true")
    args = ap.parse_args()

    from multimodal_pl_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    if not args.fwd_only:
        op_ab(args.iters)
    if not args.op_only:
        fwd_ab(args.iters)


if __name__ == "__main__":
    main()
