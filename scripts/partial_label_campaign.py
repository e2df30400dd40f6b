"""Round-2 partial-label learning campaign on synthetic AMOS.

VERDICT.md item 3: demonstrate the full partial-label system (pretrain ->
consistency ramp -> GAN) training per-case-UNSUPERVISED organs end-to-end.
Round 1's fixtures had ~0.4%-occupancy organs, which plateaued at
all-background under 1-organ-per-case supervision; these use organ_r_frac=0.2
(~1.6%/organ, ~20% total foreground — realistic abdominal occupancy).

Generates a 28-case fixture set (22 CT ids covering every CT-supervisable
organ 3..13 twice, 6 MRI), then runs the standard training CLI on it.

Usage: python scripts/partial_label_campaign.py [--root /tmp/synth_pl]
       [--epochs 800] [--skip_gen]
"""

from __future__ import annotations

import argparse
import os


# two full coverage passes of the CT supervision ranges (labels 3..13,
# data/supervision._CT_RANGES) — id -> organ: <=45:3, <=85:4, <=135:5,
# <=180:6, <=242:7, <=300:8, <=370:9, <=440:10, <=460:11, <=480:12, <=500:13
CAMPAIGN_CT_IDS = [
    40, 80, 130, 170, 240, 290, 360, 430, 455, 475, 490,
    35, 70, 120, 160, 230, 280, 340, 420, 458, 478, 495,
][: 22]


def generate(root: str, seed: int = 7, ct_only: bool = False,
             full_coverage: bool = False):
    import numpy as np
    from scipy.ndimage import gaussian_filter

    from multimodal_pl_tpu.data import synthetic as syn
    from multimodal_pl_tpu.data.nifti import write_nifti
    from multimodal_pl_tpu.data.supervision import generate_supervision_csv

    shape = (96, 96, 80)
    num_fg = 13
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "imagesTr")
    lab_dir = os.path.join(root, "labelsTr")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lab_dir, exist_ok=True)

    # ct_only: BASELINE.json config 3 (the reference's
    # AMOSDataSet_newatlas_onlyct regime — no unlabeled modality, so the GAN
    # generator term has an empty flist and training rides the marginal
    # Dice/CE + refiner/atlas consistency machinery alone)
    ids = sorted(CAMPAIGN_CT_IDS) + ([] if ct_only else list(range(500, 506)))
    labels_sum = np.zeros((num_fg, *shape), np.float32)
    for cid in ids:
        modality = "mri" if cid >= 500 else "ct"
        img, lab = syn.make_case(rng, shape, num_fg, modality, organ_r_frac=0.2)
        write_nifti(os.path.join(img_dir, f"amos_{cid:04d}_0000.nii.gz"), img, (1, 1, 2))
        write_nifti(os.path.join(lab_dir, f"amos_{cid:04d}.nii.gz"), lab, (1, 1, 2))
        for organ in range(1, num_fg + 1):
            labels_sum[organ - 1] += lab == organ
        print(f"wrote case {cid} ({modality}), fg {(lab > 0).mean() * 100:.1f}%")

    atlas = np.stack([gaussian_filter(labels_sum[i] / len(ids), 3)
                      for i in range(num_fg)])
    np.save(os.path.join(root, "atlas_mm.npy"), atlas.astype(np.float32))
    overrides = None
    if full_coverage:
        # round-5 fixture fix (VERDICT r4 item 5): the id-range table can
        # never supervise labels 1-2, and the seeded split can strand more
        # organs with zero TRAIN supervision (round-4 root cause: organ 2
        # absorbed the softmax background residual). Reproduce the dataset's
        # exact seeded 70/10/20 split and round-robin organs 1..13 over the
        # TRAIN CT cases so every organ supervises >=1 train case — the real
        # AMOS csv property (/root/reference/preprocess/atlas_gen_mm.py:14-57
        # covers all organs across its id ranges).
        import glob as _glob

        from multimodal_pl_tpu.data.dataset import split_files

        allfiles = sorted(_glob.glob(os.path.join(img_dir, "*.nii.gz")))
        train_files = split_files(allfiles, "train", 1)
        train_ids = sorted(int(os.path.basename(f).split("_")[1])
                           for f in train_files)
        train_ct = [cid for cid in train_ids if cid < 500]
        rest_ct = [cid for cid in ids if cid < 500 and cid not in train_ct]
        overrides = {}
        organ = 0
        for cid in train_ct + rest_ct:
            overrides[cid] = organ % num_fg + 1
            organ += 1
        covered = sorted({overrides[c] for c in train_ct})
        print(f"full-coverage csv: train CT {len(train_ct)} cases, organs "
              f"covered in train: {covered}")
        assert covered == list(range(1, num_fg + 1)), \
            f"need >= {num_fg} train CT cases, got {len(train_ct)}"
    generate_supervision_csv(ids, os.path.join(root, "supervise_mask.csv"),
                             organ_overrides=overrides)
    print(f"{len(ids)} cases -> {root}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/synth_pl")
    ap.add_argument("--epochs", type=int, default=800)
    ap.add_argument("--snapshot_dir", default="/tmp/synth_pl/snapshots")
    ap.add_argument("--skip_gen", action="store_true")
    ap.add_argument("--ct_only", action="store_true",
                    help="no MRI cases (BASELINE.json config 3 regime)")
    ap.add_argument("--full_coverage", action="store_true",
                    help="supervision csv guarantees every organ 1..13 has "
                         ">=1 supervising TRAIN case (round-5 13/13 fixture)")
    ap.add_argument("--batch_size", type=int, default=3)
    ap.add_argument("--val_every", type=int, default=50)
    args = ap.parse_args()

    if not args.skip_gen:
        generate(args.root, ct_only=args.ct_only,
                 full_coverage=args.full_coverage)

    from multimodal_pl_tpu.cli.train import main as train_main

    train_main([
        "--data_dir", os.path.join(args.root, "imagesTr"),
        "--atlas_path", os.path.join(args.root, "atlas_mm.npy"),
        "--supervision_csv", os.path.join(args.root, "supervise_mask.csv"),
        "--snapshot_dir", args.snapshot_dir,
        "--input_size", "64,96,96",
        "--batch_size", str(args.batch_size),
        "--num_epochs", str(args.epochs),
        "--val_pred_every", str(args.val_every),
        "--learning_rate", "5e-4",
        "--pretrain_epoch", "20",
        "--cache_data", "true",
    ])


if __name__ == "__main__":
    main()
