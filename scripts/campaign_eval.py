"""Post-hoc evaluation of a partial-label campaign checkpoint.

Runs full-volume sliding-window inference over the held-out (valid + test)
splits and prints per-organ argmax dice bucketed by MODALITY (case id < 500
=> CT, >= 500 => MRI — the dataset's modality rule, not the reference's
id-510 reporting bucket, which would misfile synthetic MRI ids 500-505).

Also reports the per-case UNSUPERVISED-organ means — the partial-label
capability the system exists to demonstrate (VERDICT.md item 3): for every
case only one organ (CT) or none (MRI) was supervised in training, so the
other organs' dice measures what the refiner/atlas consistency + GAN
machinery taught the model.

Usage: python scripts/campaign_eval.py [--root /tmp/synth_pl] [--ckpt N]
"""

from __future__ import annotations

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/synth_pl")
    ap.add_argument("--snapshot_dir", default="")
    ap.add_argument("--ckpt", type=int, default=0, help="step; 0 = latest")
    ap.add_argument("--input_size", default="64,96,96")
    ap.add_argument("--bd", action="store_true",
                    help="round-5 mixed-axis conv engine + fused kernels")
    args = ap.parse_args()
    snap = args.snapshot_dir or os.path.join(args.root, "snapshots")

    import numpy as np
    import jax
    import jax.numpy as jnp

    from multimodal_pl_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from multimodal_pl_tpu.data.dataset import AMOSDataset
    from multimodal_pl_tpu.infer.metrics import organ_scores, organ_scores_atlas
    from multimodal_pl_tpu.infer.sliding import SlidingWindowPredictor
    from multimodal_pl_tpu.models import UNet3DFEAM
    from multimodal_pl_tpu.train.checkpoint import latest_checkpoint, restore_checkpoint
    from multimodal_pl_tpu.train.state import StepConfig, create_train_state

    cfg = StepConfig(num_classes=14, deep_up=True)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    path = (os.path.join(snap, f"ckpt_{args.ckpt}") if args.ckpt
            else latest_checkpoint(snap))
    state = restore_checkpoint(path, state)
    print(f"checkpoint: {path}")

    use_bd = args.bd and jax.default_backend() == "tpu"
    if use_bd:
        from multimodal_pl_tpu.ops.bd import set_bd_fused, set_bd_pallas

        set_bd_pallas(True)
        set_bd_fused(True)
    model = UNet3DFEAM(num_classes=14, weight_std=True, deep_up=True,
                       bd=use_bd)
    tile = tuple(map(int, args.input_size.split(",")))
    predictor = SlidingWindowPredictor(
        lambda tiles, params, tokens: model.apply(params, tiles, tokens)[0],
        tile, 14,
        compute_dtype=jnp.bfloat16 if use_bd else jnp.float32)

    atlas = np.load(os.path.join(args.root, "atlas_mm.npy"))
    csvp = os.path.join(args.root, "supervise_mask.csv")
    nfg = 13
    buckets = {"ct": [np.zeros(nfg), np.zeros(nfg)],
               "mri": [np.zeros(nfg), np.zeros(nfg)]}
    unsup_sum, unsup_cnt = np.zeros(nfg), np.zeros(nfg)
    sup_vals, unsup_vals = [], []
    # The reference's own eval semantics (evaluate_amos.py:146): per-channel
    # binary threshold (p + 0.15) > (1 - atlas) instead of plain argmax. A
    # never-supervised organ channel can absorb the softmax background
    # residual (no 'be zero' pressure anywhere) and drown its argmax dice in
    # false positives; the atlas blend suppresses far-from-prior mass, which
    # is how the reference reads the same predictions.
    unsup_sum_a, unsup_cnt_a = np.zeros(nfg), np.zeros(nfg)
    unsup_vals_a = []

    for usage in ("valid", "test"):
        ds = AMOSDataset(os.path.join(args.root, "imagesTr"), crop_size=tile,
                         usage=usage, atlas=atlas, supervision_csv=csvp)
        for i in range(len(ds)):
            s = ds[i]
            logits = predictor(s.image[..., 0], state.params, state.tokens)
            dice, _, _, _ = organ_scores(logits[None], jnp.asarray(s.label)[None], nfg)
            dice = np.asarray(dice)
            catlas = jnp.asarray(s.catlas.transpose(1, 2, 3, 0))[None]
            dice_a, _, _ = organ_scores_atlas(
                logits[None], jnp.asarray(s.label)[None], catlas, nfg)
            dice_a = np.asarray(dice_a)
            mod = "mri" if s.case_id >= 500 else "ct"
            buckets[mod][0] += dice
            buckets[mod][1] += 1
            sup = np.asarray(s.sup_mask[1:]) > 0
            if sup.any():
                sup_vals.extend(dice[sup].tolist())
            unsup_vals.extend(dice[~sup].tolist())
            unsup_sum[~sup] += dice[~sup]
            unsup_cnt[~sup] += 1
            unsup_vals_a.extend(dice_a[~sup].tolist())
            unsup_sum_a[~sup] += dice_a[~sup]
            unsup_cnt_a[~sup] += 1
            print(f"  case {s.case_id:04d} ({mod}, {usage}) mean {dice.mean():.3f} "
                  f"sup {dice[sup].mean() if sup.any() else float('nan'):.3f} "
                  f"unsup {dice[~sup].mean():.3f}")

    for mod, (tot, cnt) in buckets.items():
        if cnt[0] == 0:
            continue
        per = tot / cnt
        print(f"{mod.upper()} ({int(cnt[0])} cases) mean dice {per.mean():.4f}")
        print("  per-organ: " + " ".join(f"{v:.3f}" for v in per))
    if sup_vals:
        print(f"supervised-organ dice mean: {np.mean(sup_vals):.4f}")
    per_unsup = unsup_sum / np.maximum(unsup_cnt, 1)
    print(f"per-case-unsupervised organ dice mean: {np.mean(unsup_vals):.4f}")
    print("per-organ dice over cases where that organ was UNSUPERVISED:")
    print("  " + " ".join(f"{v:.3f}" for v in per_unsup))
    print(f"  organs > 0.3: {int((per_unsup > 0.3).sum())} / {nfg}")
    per_unsup_a = unsup_sum_a / np.maximum(unsup_cnt_a, 1)
    print(f"[atlas-blended eval, (p+0.15)>(1-atlas), evaluate_amos.py:146] "
          f"unsupervised mean: {np.mean(unsup_vals_a):.4f}")
    print("  " + " ".join(f"{v:.3f}" for v in per_unsup_a))
    print(f"  organs > 0.3: {int((per_unsup_a > 0.3).sum())} / {nfg}")


if __name__ == "__main__":
    main()
