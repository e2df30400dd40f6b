"""Training CLI — flag-compatible with the reference driver.

Reference: train_amos_atlas_final.py:51-90 get_arguments. Every reference flag
is accepted (torch-only ones like --FP16/--num_gpus/--local_rank are mapped to
their TPU-world equivalents or ignored with a note) so
run_amos_atlas_final.sh maps 1:1 onto this entry point.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def str2bool(v: str) -> bool:
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def get_arguments() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="multimodal_pl_tpu trainer (unet3D FEAM)")
    # --- reference-compatible flags (train_amos_atlas_final.py:51-90) ---
    p.add_argument("--data_dir", type=str, required=False, default="data/imagesTr")
    p.add_argument("--train_list", type=str, default="")      # accepted for parity; split is seeded
    p.add_argument("--val_list", type=str, default="")
    p.add_argument("--snapshot_dir", type=str, default="snapshots/fold1/")
    p.add_argument("--reload_path", type=str, default="")
    p.add_argument("--reload_from_checkpoint", type=str2bool, default=False)
    p.add_argument("--input_size", type=str, default="64,192,192")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--num_gpus", type=int, default=1)          # parity: device count is auto
    p.add_argument("--local_rank", type=int, default=0)
    p.add_argument("--FP16", type=str2bool, default=False)     # parity: use --bf16 on TPU
    p.add_argument("--num_epochs", type=int, default=500)
    # both accepted-but-unused exactly as in the reference: max_iters is
    # threaded into AMOSDataSet_newatlas (train:168) but never consumed
    # (MOTSDataset.py defines it and ignores it), and patience appears only
    # in the argparse block (train:68)
    p.add_argument("--itrs_each_epoch", type=int, default=250,
                   help="parity no-op (dead flag in the reference too)")
    p.add_argument("--patience", type=int, default=3,
                   help="parity no-op (dead flag in the reference too)")
    p.add_argument("--start_epoch", type=int, default=0)
    p.add_argument("--stop_epoch", type=int, default=0,
                   help="stop after this epoch (LR horizon stays num_epochs) "
                        "— chunked checkpoint/resume for leak-prone hosts")
    p.add_argument("--val_pred_every", type=int, default=50)
    p.add_argument("--learning_rate", type=float, default=5e-4)
    p.add_argument("--num_classes", type=int, default=14)
    p.add_argument("--num_workers", type=int, default=1)
    p.add_argument("--weight_std", type=str2bool, default=True)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--power", type=float, default=0.9)
    p.add_argument("--weight_gan", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--ignore_label", type=int, default=255)
    p.add_argument("--is_training", action="store_true")
    p.add_argument("--random_mirror", type=str2bool, default=True)
    p.add_argument("--random_scale", type=str2bool, default=True)
    p.add_argument("--deep_up", type=str2bool, default=True)
    p.add_argument("--random_seed", type=int, default=1234)
    p.add_argument("--gpu", type=str, default="None")
    p.add_argument("--disweight", type=float, default=0)
    p.add_argument("--augmask", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--pretrain_epoch", type=int, default=20)
    # --- TPU-native additions ---
    p.add_argument("--atlas_path", type=str, default="atlas_mm.npy")
    p.add_argument("--supervision_csv", type=str, default="supervise_mask.csv")
    p.add_argument("--bf16", type=str2bool, default=True,
                   help="bfloat16 compute policy (f32 losses/optimizer). The "
                        "full 64x192x192 patch does not fit 16G HBM in f32")
    p.add_argument("--remat", type=str2bool, default=False,
                   help="checkpoint U-Net stages to fit larger batches/patches "
                        "in HBM. bf16 batch 1 at 64x192x192 fits a 16G chip "
                        "without it and runs 1.13x faster (565 vs 628 ms/step)")
    p.add_argument("--mesh", type=str, default="",
                   help="data-parallel mesh spec, e.g. 'data:8' (empty = single device)")
    # model geometry (defaults == the reference network; smaller values are
    # for smoke tests / constrained hosts — see train.state.tiny_step_config)
    p.add_argument("--model_base", type=int, default=32,
                   help="U-Net stage-width base (reference: 32)")
    p.add_argument("--model_layers", type=str, default="1,2,2,2,2",
                   help="residual blocks per stage (reference: 1,2,2,2,2)")
    p.add_argument("--refiner_filter", type=int, default=24,
                   help="refiner init_filter (reference: 24)")
    p.add_argument("--disc_ndf", type=int, default=32,
                   help="discriminator base width (reference: 32)")
    p.add_argument("--disc_depth", type=int, default=6,
                   help="discriminator stride-2 conv count; sets the minimum "
                        "patch edge 2**(depth-1) (reference: 6 -> 64)")
    p.add_argument("--pallas_gn", type=str2bool, default=False,
                   help="fused Pallas GN->ReLU kernel for the voxel-domain "
                        "pre-activations (ops/pallas/fused_gn_relu.py)")
    p.add_argument("--bd", type=str2bool, default=False,
                   help="train the segmenter on the round-5 mixed-axis block "
                        "domain (ops/bd.py; minimal-MAC-inflation layouts, "
                        "XLA lowerings — differentiable). Param tree and "
                        "checkpoints are identical either way")
    p.add_argument("--pallas_k2", type=str2bool, default=False,
                   help="Pallas fused-gather kernel for the s2d block-domain "
                        "stride-1 k2 convs (ops/pallas/k2_conv.py)")
    p.add_argument("--cache_data", type=str2bool, default=False,
                   help="memoize prepared volumes (NIfTI read + atlas resize + "
                        "pad/truncate) in host RAM — ~0.5 GB/case at the AMOS "
                        "256x256x128 grid; random crops/augs still re-sample")
    p.add_argument("--train_refiner", type=str2bool, default=True,
                   help="include the refiner in the SGD update (the paper's "
                        "intent; the reference snapshot's optimizer covers "
                        "model.parameters() only, train:132 — false "
                        "reproduces that literal behavior)")
    p.add_argument("--log_every", type=int, default=10,
                   help="per-step JSONL metric cadence (1 = every step; each "
                        "log forces a device->host sync, so >1 preserves "
                        "async dispatch on short epochs; <=0 disables "
                        "per-step logs, keeping epoch summaries)")
    p.add_argument("--device_data", choices=("auto", "true", "false"),
                   default="auto",
                   help="hold the prepared training set in DEVICE memory and "
                        "assemble batches (crop + intensity augs) on device — "
                        "per-step host traffic drops to bytes "
                        "(data/device_cache.py). Composes with --mesh data:N "
                        "(dataset replicated, shards assembled locally per "
                        "device). auto: on when case shapes are uniform")
    return p


def main(argv=None):
    args = get_arguments().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from multimodal_pl_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from multimodal_pl_tpu.data.dataset import AMOSDataset
    from multimodal_pl_tpu.train import StepConfig, create_train_state, make_train_step
    from multimodal_pl_tpu.train.state import build_models
    from multimodal_pl_tpu.train.checkpoint import latest_checkpoint, restore_checkpoint
    from multimodal_pl_tpu.train.loop import LoopConfig, train_loop
    from multimodal_pl_tpu.utils.prng import seedfix

    d, h, w = map(int, args.input_size.split(","))
    rng = seedfix(args.seed)

    scfg = StepConfig(
        num_classes=args.num_classes,
        num_epochs=args.num_epochs,
        deep_up=args.deep_up,
        augmask=args.augmask,
        weight_gan=args.weight_gan,
        momentum=args.momentum,
        weight_decay=args.weight_decay,
        pretrain_epoch=args.pretrain_epoch,
        remat=args.remat,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        pallas_gn=args.pallas_gn,
        pallas_k2=args.pallas_k2,
        bd=args.bd,
        train_refiner=args.train_refiner,
        weight_std=args.weight_std,
        base=args.model_base,
        layers=tuple(int(x) for x in args.model_layers.split(",")),
        refiner_filter=args.refiner_filter,
        disc_ndf=args.disc_ndf,
        disc_depth=args.disc_depth,
    )
    state = create_train_state(rng, scfg)
    if args.reload_from_checkpoint:
        path = args.reload_path or latest_checkpoint(args.snapshot_dir)
        if path and os.path.exists(path):
            print(f"loading from checkpoint: {path}")
            state = restore_checkpoint(path, state)
        else:
            print(f"File not exists in the reload path: {args.reload_path}")

    model, refiner, disc = build_models(scfg)

    atlas = np.load(args.atlas_path) if os.path.exists(args.atlas_path) else None
    sup_csv = args.supervision_csv if os.path.exists(args.supervision_csv) else None
    train_ds = AMOSDataset(args.data_dir, crop_size=(d, h, w), usage="train",
                           atlas=atlas, supervision_csv=sup_csv, seed=args.seed,
                           cache=args.cache_data)
    valid_ds = AMOSDataset(args.data_dir, crop_size=(d, h, w), usage="valid",
                           atlas=atlas, supervision_csv=sup_csv)
    print(f"{len(train_ds)} train / {len(valid_ds)} valid cases")

    n_dev = 1
    mesh = None
    if args.mesh:
        from multimodal_pl_tpu.parallel.mesh import make_mesh
        from multimodal_pl_tpu.parallel.sharded_step import make_sharded_train_step

        mesh = make_mesh(args.mesh)
        n_dev = mesh.devices.size
        step_fn = make_sharded_train_step(model, refiner, disc, scfg, mesh)
    else:
        step_fn = make_train_step(model, refiner, disc, scfg)

    lcfg = LoopConfig(
        num_epochs=args.num_epochs,
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
        power=args.power,
        val_every=args.val_pred_every,
        snapshot_dir=args.snapshot_dir,
        start_epoch=args.start_epoch,
        stop_epoch=args.stop_epoch,
        tile=(d, h, w),
        num_classes=args.num_classes,
    )
    device_pipe = None
    if args.device_data != "false":
        try:
            from multimodal_pl_tpu.data.device_cache import DeviceDataPipeline

            device_pipe = DeviceDataPipeline(
                train_ds, compute_dtype=scfg.compute_dtype, seed=args.seed,
                mesh=mesh)
            print(f"device data pipeline: {len(train_ds)} cases resident in "
                  f"device memory ({device_pipe.images.nbytes / 1e6:.0f} MB "
                  f"images, {device_pipe.n_shards} shard(s))")
        except ValueError as e:
            if args.device_data == "true":
                raise
            print(f"device data pipeline unavailable ({e}); using host path")
    train_loop(state, step_fn, model, train_ds, valid_ds, scfg, lcfg, n_dev=n_dev,
               device_pipe=device_pipe, log_every=args.log_every)


if __name__ == "__main__":
    main()
