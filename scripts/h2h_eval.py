"""Evaluate the torch-reference h2h checkpoint and the matched mpl-train
checkpoint with the SAME evaluator (our sliding-window + metrics), and print
both per-organ dice tables side by side.

The torch .pth is converted through train/torch_import.py (the bidirectional
checkpoint interop layer, parity-pinned by tests/test_torch_parity.py), so
any dice delta between the two rows is attributable to the TRAINING dynamics,
not the evaluation stack.

Usage:
  python scripts/h2h_eval.py --torch_pth /tmp/h2h/snapshots/fold1/MOTS_DynConv_fold1_e29.pth \
      [--ours_ckpt /tmp/h2h_ours/snapshots/ckpt_570] [--root /tmp/synth_pl] \
      [--input_size 64,64,64]
"""

from __future__ import annotations

import argparse
import os


def eval_params(params, tokens, root, tile, label):
    import numpy as np
    import jax.numpy as jnp

    from multimodal_pl_tpu.data.dataset import AMOSDataset
    from multimodal_pl_tpu.infer.metrics import organ_scores, organ_scores_atlas
    from multimodal_pl_tpu.infer.sliding import SlidingWindowPredictor
    from multimodal_pl_tpu.models import UNet3DFEAM

    model = UNet3DFEAM(num_classes=14, weight_std=True, deep_up=True)
    predictor = SlidingWindowPredictor(
        lambda tiles, p, t: model.apply(p, tiles, t)[0], tile, 14)
    atlas = np.load(os.path.join(root, "atlas_mm.npy"))
    csvp = os.path.join(root, "supervise_mask.csv")
    nfg = 13
    tot, tot_a, n = np.zeros(nfg), np.zeros(nfg), 0
    for usage in ("valid", "test"):
        ds = AMOSDataset(os.path.join(root, "imagesTr"), crop_size=tile,
                         usage=usage, atlas=atlas, supervision_csv=csvp)
        for i in range(len(ds)):
            s = ds[i]
            logits = predictor(s.image[..., 0], params, tokens)
            dice, _, _, _ = organ_scores(logits[None], jnp.asarray(s.label)[None], nfg)
            catlas = jnp.asarray(s.catlas.transpose(1, 2, 3, 0))[None]
            dice_a, _, _ = organ_scores_atlas(
                logits[None], jnp.asarray(s.label)[None], catlas, nfg)
            tot += np.asarray(dice)
            tot_a += np.asarray(dice_a)
            n += 1
    per, per_a = tot / n, tot_a / n
    print(f"{label}: held-out mean dice argmax {per.mean():.4f} | "
          f"atlas-blended {per_a.mean():.4f} ({n} cases)")
    print("  argmax per-organ: " + " ".join(f"{v:.3f}" for v in per))
    print("  atlas  per-organ: " + " ".join(f"{v:.3f}" for v in per_a))
    return per, per_a


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/synth_pl")
    ap.add_argument("--torch_pth", required=True)
    ap.add_argument("--ours_ckpt", default="")
    ap.add_argument("--input_size", default="64,64,64")
    args = ap.parse_args()
    tile = tuple(map(int, args.input_size.split(",")))

    from multimodal_pl_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import torch
    import jax
    import jax.numpy as jnp

    from multimodal_pl_tpu.train.torch_import import feam_state_dict_to_params

    ckpt = torch.load(args.torch_pth, map_location="cpu", weights_only=False)
    params, tokens = feam_state_dict_to_params(ckpt["model"])
    if tokens is None:
        from multimodal_pl_tpu.models import init_class_tokens

        tokens = init_class_tokens(jax.random.PRNGKey(1), 14)
    eval_params(params, tokens, args.root, tile, "torch-reference")

    if args.ours_ckpt:
        from multimodal_pl_tpu.train.checkpoint import restore_checkpoint
        from multimodal_pl_tpu.train.state import StepConfig, create_train_state

        cfg = StepConfig(num_classes=14, deep_up=True)
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        state = restore_checkpoint(args.ours_ckpt, state)
        eval_params(state.params, state.tokens, args.root, tile, "mpl-train (tpu)")


if __name__ == "__main__":
    main()
