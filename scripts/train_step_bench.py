"""Train-step throughput A/B bench on the real chip.

Times the full fused partial-label train step (segmenter + refiner + GAN +
token EMA, train_amos_atlas_final.py:209-391 equivalent) at the production
1x64x192x192 patch, with flag combinations for the Pallas routing switches.

Methodology matches PERF.md: loop-in-jit is not possible for the stateful
step, so we time N sequential steps end-to-end with a device->host scalar
sync per step (axon's block_until_ready can return early), warmup excluded,
and report the MEDIAN of per-step times.

Usage: python scripts/train_step_bench.py [--steps 12] [--patch 64,192,192]
       [--configs xla,k2,gn,k2gn]
"""

from __future__ import annotations

import argparse
import statistics
import time


def run_config(name: str, pallas_k2: bool, pallas_gn: bool, patch, steps: int,
               batch: int = 1, remat: bool = False, pallas_infer: bool = False,
               bd: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_pl_tpu.models import (
        NormStyleDiscriminator,
        RefinerUNet3D,
        UNet3DFEAM,
    )
    from multimodal_pl_tpu.train import StepConfig, create_train_state, make_train_step

    cfg = StepConfig(num_classes=14, deep_up=True, augmask=2, weight_gan=1e-3,
                     compute_dtype=jnp.bfloat16, remat=remat,
                     pallas_k2=pallas_k2, pallas_gn=pallas_gn,
                     pallas_infer=pallas_infer, bd=bd)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    model = UNet3DFEAM(num_classes=14, weight_std=True, deep_up=True,
                       remat=remat, bd=bd)
    refiner = RefinerUNet3D(num_classes=2, weight_std=True, init_filter=24,
                            in_channel=2)
    disc = NormStyleDiscriminator()
    step = make_train_step(model, refiner, disc, cfg)

    rng = np.random.default_rng(0)
    b = batch
    batch = {
        "image": jnp.asarray(rng.standard_normal((b, *patch, 1)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 14, (b, *patch)), jnp.int32),
        "catlas": jnp.asarray(rng.random((13, *patch)), jnp.float32),
        "sup_mask": jnp.asarray([0, 0, 0, 1] + [0] * 10, jnp.float32),
        "label_t": jnp.asarray([0, 0, 0, 0, 1, 1, 1, 1, 1, 0, 1, 1, 1], jnp.float32),
    }
    lr = jnp.float32(5e-4)
    wf = jnp.float32(0.05)

    # warmup: compile + one steady-state step
    for _ in range(2):
        state, metrics = step(state, batch, lr, wf)
        _ = float(metrics["loss"])

    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        state, metrics = step(state, batch, lr, wf)
        _ = float(metrics["loss"])  # forced sync
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)
    hbm = ""
    try:
        ms = jax.local_devices()[0].memory_stats()
        peak = ms.get("peak_bytes_in_use", 0) / 2**30
        lim = ms.get("bytes_limit", 0) / 2**30
        if peak:
            hbm = f"  HBM peak {peak:.2f}G" + (f"/{lim:.2f}G" if lim else "")
    except Exception:
        pass
    print(f"{name:8s} b{b} median {med * 1e3:7.1f} ms/step  "
          f"({b / med:.2f} patches/s)  min {min(times) * 1e3:.1f}  "
          f"max {max(times) * 1e3:.1f}{hbm}", flush=True)
    return med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--patch", default="64,192,192")
    ap.add_argument("--configs", default="xla,k2")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--remat", action="store_true")
    args = ap.parse_args()
    patch = tuple(map(int, args.patch.split(",")))

    from multimodal_pl_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    flags = {"xla": (False, False, False), "k2": (True, False, False),
             "gn": (False, True, False), "k2gn": (True, True, False),
             # inference-only fused kernels on the step's gradient-free
             # refiner complement pass only (StepConfig.pallas_infer)
             "infer": (False, False, True),
             # round-5 mixed-axis block domain (StepConfig.bd; XLA lowerings)
             "bd": (False, False, False),
             # bd + fused inference kernels on the no-grad refiner pass
             "bd_infer": (False, False, True)}
    for name in args.configs.split(","):
        k2, gn, infer = flags[name]
        run_config(name, k2, gn, patch, args.steps, batch=args.batch,
                   remat=args.remat, pallas_infer=infer,
                   bd=name.startswith("bd"))


if __name__ == "__main__":
    main()
