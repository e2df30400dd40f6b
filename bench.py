"""Benchmark: sliding-window full-volume inference, volumes/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The headline config is BASELINE.json config 2 — full-volume sliding-window
inference with Gaussian blending on an AMOS-preprocessed-sized CT volume
(128 x 256 x 256, tile 64 x 192 x 192 => 12 windows) through the flagship
FEAM segmenter. ``vs_baseline`` is the speedup over the reference-style
implementation measured on the SAME chip: a Python per-tile loop with
host<->device transfers and host-side Gaussian accumulate
(evaluate_amos.py:211-279), which is what the reference's GPU numbers were
produced with. (The reference publishes no absolute GPU throughput —
BASELINE.md — so the like-for-like loop on identical hardware is the
baseline.)

Methodology (round 2, after the round-1 driver capture came in at half the
claimed number):
  - one full WARMUP epoch of the streaming pipeline (compile + prefetch
    steady state) before any timing;
  - the headline is the MEDIAN of N_EPOCHS timed streaming epochs, each a
    full ``predict_iter`` pass over REPS distinct volumes — robust to the
    host-contention spikes this 1-vCPU axon tunnel is prone to;
  - the decomposition line separates the no-overlap one-shot path (same
    compute, serial transfer) from the streaming path, so the prefetch
    overlap's contribution to the headline — which the serial reference
    loop does not get — is visible next to the speedup ratio.

NOTE (axon platform): block_until_ready() can return before execution
completes, so every timed section forces a device->host scalar sync.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import numpy as np


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x))


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()

    from multimodal_pl_tpu.infer.sliding import (
        SlidingWindowPredictor,
        make_window_grid,
        predict_sliding_naive,
    )
    from multimodal_pl_tpu.models import UNet3DFEAM, init_class_tokens

    VOL = (128, 256, 256)
    TILE = (64, 192, 192)
    NC = 14
    REPS = 5        # volumes per streaming epoch
    N_EPOCHS = 5    # timed epochs; headline = median

    import os

    on_tpu = jax.default_backend() == "tpu"
    # Engine selection (round 5): 'bd' = mixed-axis block domain with the
    # fused masked-GN conv kernels (ops/bd.py + ops/pallas/bdx.py — the
    # minimal-FLOP-inflation layouts); 's2d' = the round-1..4 3-axis
    # space-to-depth engine with pallas_k2 + fused_gn.
    engine = os.environ.get("MPL_BENCH_ENGINE", "bd")
    if engine == "bd":
        from multimodal_pl_tpu.ops.bd import set_bd_fused, set_bd_pallas

        set_bd_pallas(on_tpu)
        set_bd_fused(on_tpu)
        model = UNet3DFEAM(num_classes=NC, weight_std=True, deep_up=True,
                           bd=on_tpu)
    else:
        from multimodal_pl_tpu.ops.s2d import set_k2_fused_gn, set_k2_pallas

        # Pallas fused-gather k2 conv: -27% on the flagship eval forward
        # (159 -> 117 ms at batch 2, PERF.md round-2 log) plus the round-4
        # fused GN->ReLU input path (mpl-evaluate --fused_gn).
        set_k2_pallas(on_tpu)
        set_k2_fused_gn(on_tpu)
        model = UNet3DFEAM(num_classes=NC, weight_std=True, deep_up=True)
    tokens = init_class_tokens(jax.random.PRNGKey(1), NC)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 16, 32, 32, 1)), tokens)
    fwd = lambda tiles: model.apply(params, tiles, tokens)[0]

    rng = np.random.default_rng(0)
    vol = rng.standard_normal(VOL).astype(np.float32)
    vols = [rng.standard_normal(VOL).astype(np.float32) for _ in range(REPS)]
    n_windows = len(make_window_grid(VOL, TILE))

    # ---- batched XLA scan path (bf16 compute / f32 blend: the shipping
    # TPU inference config; the naive loop below runs the reference's f32).
    # Volumes ship bf16 (bit-identical to f32-then-cast), pad on device, and
    # predict_iter overlaps the next volume's transfer with compute — the
    # steady-state streaming throughput of a real evaluation pass. ----
    # output='argmax': the production inference artifact is the uint8 label
    # map; argmax is count-normalization-invariant, so the count
    # accumulator, normalize pass, and f32 logits output drop out of the
    # program (the round-5 fused epilogue; parity pinned in test_sliding).
    predictor = SlidingWindowPredictor(fwd, TILE, NC, window_batch=4,
                                       compute_dtype=jnp.bfloat16,
                                       output="argmax")
    _sync(predictor(vol))  # compile (scan + pad programs)
    for out in predictor.predict_iter(vols):  # warmup epoch: prefetch steady state
        _sync(out)

    epoch_dts = []
    for _ in range(N_EPOCHS):
        # per-epoch sync: each volume's consumption (the sum) dispatches
        # asynchronously and chains on device; only ONE host round trip per
        # epoch. A per-volume float() fetch would serialize every volume on
        # the ~30 ms axon-tunnel RTT — latency the reference-style loop
        # comparison already pays per TILE, and which a production pipeline
        # (device-side metrics, batched fetches) does not pay per volume.
        t0 = time.time()
        acc = None
        for out in predictor.predict_iter(vols):
            s = jnp.sum(out.astype(jnp.float32))
            acc = s if acc is None else acc + s
        _ = float(acc)
        epoch_dts.append((time.time() - t0) / REPS)
    fast_dt = statistics.median(epoch_dts)
    fast_vps = 1.0 / fast_dt

    # ---- no-overlap decomposition: same program, one volume at a time
    # (serial transfer -> compute -> sync). The difference vs fast_dt is the
    # prefetch-overlap contribution, which the serial baseline loop lacks. ----
    oneshot_dts = []
    for v in vols:
        t0 = time.time()
        _sync(predictor(v))
        oneshot_dts.append(time.time() - t0)
    oneshot_dt = statistics.median(oneshot_dts)

    # ---- reference-style per-tile Python loop on the same chip ----
    # median of 3: the loop is transfer-bound through the axon tunnel and has
    # swung 86-159 s/vol across rounds on this contended host
    tile_fwd = jax.jit(fwd)
    _sync(tile_fwd(jnp.zeros((1, *TILE, 1))))  # compile
    apply_naive = lambda t: np.asarray(tile_fwd(jnp.asarray(t)))
    naive_dts = []
    for _ in range(3):
        t0 = time.time()
        predict_sliding_naive(apply_naive, vol, TILE, NC)
        naive_dts.append(time.time() - t0)
    naive_dt = statistics.median(naive_dts)
    naive_vps = 1.0 / naive_dt

    # MFU on LOGICAL voxel FLOPs (the reference model's math — conv +
    # attention matmuls, utils/flops.py; blocked forms' inflated machine
    # MACs deliberately NOT counted) against the v5e dense-bf16 peak.
    from multimodal_pl_tpu.utils.flops import V5E_BF16_PEAK, flagship_forward_flops

    flops_per_vol = n_windows * flagship_forward_flops(TILE, batch=1)
    mfu = flops_per_vol * fast_vps / V5E_BF16_PEAK

    result = {
        "metric": "sliding-window inference volumes/sec/chip "
                  f"({VOL[0]}x{VOL[1]}x{VOL[2]} vol, {TILE[0]}x{TILE[1]}x{TILE[2]} tile, "
                  f"{n_windows} windows, FEAM-14)",
        "value": round(fast_vps, 4),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(fast_vps / naive_vps, 3),
        "engine": engine,
        "mfu": round(mfu, 4),
        "mfu_basis": "logical voxel FLOPs of the reference model "
                     f"({flops_per_vol / 1e12:.2f} TFLOP/vol = {n_windows} "
                     "windows x utils/flops.flagship_forward_flops; blocked "
                     "layouts issue more machine MACs, not counted) / "
                     "197 TF/s v5e dense-bf16 peak",
        # Self-description (VERDICT r3 item 10): what vs_baseline compares
        # against, plus the baseline's own measured spread so the headline
        # reports its noise. The reference log records no GPU throughput
        # (BASELINE.md), so the baseline is NOT the 3-GPU rig.
        "baseline": "reference-style per-tile Python loop (f32, per-tile "
                    "host<->device transfer + host Gaussian accumulate, "
                    "evaluate_amos.py:211-279) on the SAME TPU chip",
        "baseline_s_per_vol": [round(d, 1) for d in naive_dts],
        "streaming_s_per_vol": [round(d, 3) for d in epoch_dts],
    }
    print(json.dumps(result))
    print(f"# streaming (median of {N_EPOCHS} epochs x {REPS} vols): {fast_dt:.3f}s/vol "
          f"(epochs: {', '.join(f'{d:.3f}' for d in epoch_dts)}) | "
          f"one-shot no-overlap: {oneshot_dt:.3f}s/vol "
          f"(prefetch overlap saves {oneshot_dt - fast_dt:.3f}s/vol; the serial "
          f"reference loop has no such overlap) | "
          f"reference-style loop on same chip: {naive_dt:.3f}s/vol "
          f"(median of {', '.join(f'{d:.1f}' for d in naive_dts)}) | "
          f"speedup {fast_vps / naive_vps:.2f}x | "
          f"engine {engine} | {flops_per_vol * fast_vps / 1e12:.1f} TF/s "
          f"logical = {mfu * 100:.1f}% MFU", file=sys.stderr)


if __name__ == "__main__":
    main()
