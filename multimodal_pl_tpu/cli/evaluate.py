"""Evaluation CLI — flag-compatible with the reference evaluate_amos.py.

Full-volume sliding-window prediction over the test split with per-case CSV,
per-organ CT/MRI dice/sensitivity/specificity tables, and optional NIfTI
prediction dumps (reference evaluate_amos.py:316-542, 548-631).
"""

from __future__ import annotations

import argparse
import csv
import os

import numpy as np

from multimodal_pl_tpu.cli.train import str2bool


def get_arguments() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="multimodal_pl_tpu evaluator")
    # reference-compatible flags (evaluate_amos.py:54-88)
    p.add_argument("--data_dir", type=str, default="data/imagesTr")
    p.add_argument("--val_list", type=str, default="")
    p.add_argument("--reload_path", type=str, default="")
    p.add_argument("--reload_from_checkpoint", type=str2bool, default=True)
    p.add_argument("--save_path", type=str, default="outputs/")
    p.add_argument("--input_size", type=str, default="64,192,192")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--num_gpus", type=int, default=1)
    p.add_argument("--local_rank", type=int, default=0)
    p.add_argument("--FP16", type=str2bool, default=False)
    p.add_argument("--num_classes", type=int, default=14)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--weight_std", type=str2bool, default=True)
    p.add_argument("--print", dest="print_preds", type=str2bool, default=False)
    p.add_argument("--dataset_type", type=str, default="default")
    p.add_argument("--usage", type=str, default="test", choices=["test", "valid", "train"])
    # TPU-native additions
    p.add_argument("--atlas_path", type=str, default="atlas_mm.npy")
    p.add_argument("--tta", type=str2bool, default=False, help="8-way flip TTA")
    p.add_argument("--window_batch", type=int, default=4)
    p.add_argument("--use_atlas_threshold", type=str2bool, default=False,
                   help="atlas-blended decision rule (evaluate_amos.py:146)")
    p.add_argument("--deep_up", type=str2bool, default=True)
    p.add_argument("--bf16", type=str2bool, default=True,
                   help="bfloat16 tile compute (f32 Gaussian blend)")
    p.add_argument("--pallas_k2", type=str2bool, default=True,
                   help="Pallas fused-gather k2 conv for the s2d block-domain "
                        "stages (-27%% on the tile forward on v5e; TPU only — "
                        "ignored on other backends)")
    p.add_argument("--fused_gn", type=str2bool, default=True,
                   help="fuse GN->ReLU into the Pallas k2 conv's input path "
                        "(normalized activations never round-trip HBM; "
                        "TPU-only, requires --pallas_k2)")
    p.add_argument("--bd", type=str2bool, default=True,
                   help="round-5 mixed-axis conv engine (ops/bd.py + fused "
                        "bdx kernels): minimal-MAC-inflation per-stage "
                        "layouts; supersedes --pallas_k2/--fused_gn on TPU "
                        "(measured 87.2 vs 104.3 ms eval forward at B=2)")
    p.add_argument("--mesh", type=str, default="",
                   help="device mesh: 'data:N' shards windows (DP); "
                        "'space:N' splits each window's H axis across chips "
                        "via GSPMD (volumetric model parallelism) — "
                        "the TPU-native equivalent of the reference's "
                        "nn.DataParallel eval (evaluate_amos.py:580)")
    return p


def _save_qualitative_png(save_path: str, sample, pred: np.ndarray) -> None:
    """Middle-slice image/label/prediction triptych (reference
    evaluate_amos.py:441-480)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    t = pred.shape[0] // 2
    fig, axes = plt.subplots(1, 3, figsize=(9, 3))
    axes[0].imshow(sample.image[t, :, :, 0], cmap="gray")
    axes[1].imshow(sample.label[t], vmin=0, vmax=13, cmap="nipy_spectral")
    axes[2].imshow(pred[t], vmin=0, vmax=13, cmap="nipy_spectral")
    for ax in axes:
        ax.axis("off")
    plt.subplots_adjust(wspace=0.02, hspace=0.02)
    fig.savefig(os.path.join(save_path, f"{sample.name}.png"), dpi=150,
                bbox_inches="tight")
    plt.close(fig)


def main(argv=None):
    args = get_arguments().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from multimodal_pl_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from multimodal_pl_tpu.data.dataset import AMOSDataset
    from multimodal_pl_tpu.data.nifti import write_nifti
    from multimodal_pl_tpu.infer.metrics import organ_scores, organ_scores_atlas
    from multimodal_pl_tpu.infer.sliding import SlidingWindowPredictor
    from multimodal_pl_tpu.models import UNet3DFEAM
    from multimodal_pl_tpu.train import StepConfig, create_train_state
    from multimodal_pl_tpu.train.checkpoint import latest_checkpoint, restore_checkpoint

    d, h, w = map(int, args.input_size.split(","))
    nfg = args.num_classes - 1

    scfg = StepConfig(num_classes=args.num_classes, deep_up=args.deep_up)

    # --reload_path accepts comma-separated checkpoints: multi-net ensemble
    # averaging of logits (reference multi_net, evaluate_amos.py:199-209)
    states = []
    paths = [p for p in args.reload_path.split(",") if p] or [""]
    for pth in paths:
        state = create_train_state(jax.random.PRNGKey(1234), scfg)
        if args.reload_from_checkpoint:
            path = pth or latest_checkpoint(os.path.dirname(pth) or ".")
            if path and os.path.exists(path):
                print(f"loading from checkpoint: {path}")
                state = restore_checkpoint(path, state)
            else:
                print(f"File not exists in the reload path: {pth}")
        states.append(state)

    import jax as _jax

    # TPU-only gates: other backends fall back to interpret mode, which is
    # orders of magnitude slower than the XLA lowering
    on_tpu = _jax.default_backend() == "tpu"
    if args.bd:
        from multimodal_pl_tpu.ops.bd import set_bd_fused, set_bd_pallas

        set_bd_pallas(on_tpu)
        set_bd_fused(on_tpu)
    elif args.pallas_k2:
        from multimodal_pl_tpu.ops.s2d import set_k2_pallas

        set_k2_pallas(on_tpu)
        if args.fused_gn:
            from multimodal_pl_tpu.ops.s2d import set_k2_fused_gn

            set_k2_fused_gn(on_tpu)

    model = UNet3DFEAM(num_classes=args.num_classes, weight_std=args.weight_std,
                       deep_up=args.deep_up, bd=args.bd and on_tpu)

    # params/tokens are DYNAMIC arguments of the compiled window scan (one
    # (params, tokens) pair per ensemble member), so swapping checkpoints —
    # or evaluating repeatedly in-loop — never recompiles the scan program
    # (infer/sliding.py design note; reference multi_net evaluate_amos.py:199)
    def fwd(tiles, *member_trees):
        out = None
        for p, t in zip(member_trees[0::2], member_trees[1::2]):
            o = model.apply(p, tiles, t)[0]
            out = o if out is None else out + o
        return out / (len(member_trees) // 2)

    member_args = []
    for s in states:
        member_args += [s.params, s.tokens]

    state = states[0]
    compute_dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.mesh and "space" in args.mesh:
        # volumetric model parallelism: each window's H axis is split over
        # the mesh and GSPMD partitions the network forward (halo exchanges,
        # cross-slab GN reductions) across chips — for tiles too large for
        # one chip's HBM
        from multimodal_pl_tpu.parallel.mesh import make_mesh
        from multimodal_pl_tpu.parallel.spatial import spatial_sharding

        mesh = make_mesh(args.mesh)
        predictor = SlidingWindowPredictor(
            fwd, (d, h, w), args.num_classes, window_batch=args.window_batch,
            tta=args.tta, compute_dtype=compute_dtype,
            tile_sharding=spatial_sharding(mesh))
    elif args.mesh:
        from multimodal_pl_tpu.parallel.mesh import make_mesh
        from multimodal_pl_tpu.parallel.sharded_infer import (
            ShardedSlidingWindowPredictor,
        )

        mesh = make_mesh(args.mesh)
        predictor = ShardedSlidingWindowPredictor(
            fwd, (d, h, w), args.num_classes, mesh,
            window_batch=args.window_batch, compute_dtype=compute_dtype)
    else:
        predictor = SlidingWindowPredictor(
            fwd, (d, h, w), args.num_classes, window_batch=args.window_batch,
            tta=args.tta, compute_dtype=compute_dtype)

    atlas = np.load(args.atlas_path) if os.path.exists(args.atlas_path) else None
    ds = AMOSDataset(args.data_dir, crop_size=(d, h, w), usage=args.usage, atlas=atlas)
    print(f"{len(ds)} {args.usage} cases")

    os.makedirs(args.save_path, exist_ok=True)
    csv_path = os.path.join(args.save_path, "per_case_dice.csv")
    ct_dice = np.zeros(nfg); ct_n = 0
    mri_dice = np.zeros(nfg); mri_n = 0
    ct_senc = np.zeros(nfg); mri_senc = np.zeros(nfg)
    ct_spec = np.zeros(nfg); mri_spec = np.zeros(nfg)
    per_case_ct: list = []
    per_case_mri: list = []

    with open(csv_path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["case"] + [f"organ{i}" for i in range(nfg)])
        # stream cases through the prefetching predictor: case i+1's disk
        # read + preprocess + host->device copy overlap case i's compute
        pending: list = []

        def _volumes():
            for i in range(len(ds)):
                s = ds[i]
                pending.append(s)
                yield s.image[..., 0]

        for logits in predictor.predict_iter(_volumes(), *member_args):
            s = pending.pop(0)
            if args.use_atlas_threshold and atlas is not None:
                catlas_dhw1 = jnp.moveaxis(jnp.asarray(s.catlas), 0, -1)[None]
                dice, senc, spec = organ_scores_atlas(
                    logits[None], jnp.asarray(s.label)[None], catlas_dhw1, nfg)
                pred = np.asarray(jnp.argmax(logits, -1))
            else:
                dice, senc, spec, pred = organ_scores(
                    logits[None], jnp.asarray(s.label)[None], nfg)
                pred = np.asarray(pred)[0]
            dice, senc, spec = np.asarray(dice), np.asarray(senc), np.asarray(spec)
            writer.writerow([s.name] + [f"{x:.4f}" for x in dice])
            print(f"{s.name}: mean dice {dice.mean():.4f}")
            if s.case_id < 507:   # CT/MRI bucket threshold (evaluate_amos.py:374)
                ct_dice += dice; ct_senc += senc; ct_spec += spec; ct_n += 1
                per_case_ct.append(dice)
            else:
                mri_dice += dice; mri_senc += senc; mri_spec += spec; mri_n += 1
                per_case_mri.append(dice)
            if args.print_preds:
                write_nifti(os.path.join(args.save_path, f"{s.name}_pred.nii.gz"),
                            pred.astype(np.uint8), (1, 1, 2))
                _save_qualitative_png(args.save_path, s, pred)

    for name, tot, cnt, cases in [("CT", ct_dice, ct_n, per_case_ct),
                                  ("MRI", mri_dice, mri_n, per_case_mri)]:
        mean = tot / max(cnt, 1)
        print(f"Sum results {name}")
        for t in range(nfg):
            print(f"Sum: Task{t}- Organ:{mean[t]:.4f}")
        print("mean_result", float(mean.mean()))
        if cases:  # per-organ mean/std tables (evaluate_amos.py:507-508)
            arr = np.stack(cases)
            print(f"{name} per-organ mean: {np.round(arr.mean(0), 4).tolist()}")
            print(f"{name} per-organ std:  {np.round(arr.std(0), 4).tolist()}")
    print(f"per-case CSV: {csv_path}")


if __name__ == "__main__":
    main()
