#!/usr/bin/env bash
# TPU launch of the full multimodal partial-label AMOS training
# (flag-for-flag equivalent of the reference run_amos_atlas_final.sh:
# input 64x192x192, 14 classes, lr 5e-4, 500 epochs, weight_std, deep_up,
# weight_gan 1e-3, augmask 2, pretrain_epoch 20; the reference's 3-GPU DDP
# becomes a data mesh sized to the attached TPU slice).
set -euo pipefail

DATA_DIR=${DATA_DIR:-data/imagesTr}
SNAPSHOT_DIR=${SNAPSHOT_DIR:-snapshots/amos_ours_tpu}
MESH=${MESH:-}            # e.g. "data:4" on a v5e-4 slice; empty = single chip
LOGFILE=${LOGFILE:-run_files/amos_ours_tpu.txt}

mkdir -p "$(dirname "$LOGFILE")" "$SNAPSHOT_DIR"

python -m multimodal_pl_tpu.cli.train \
    --data_dir="$DATA_DIR" \
    --snapshot_dir="$SNAPSHOT_DIR" \
    --input_size=64,192,192 \
    --batch_size=${BATCH_SIZE:-3} \
    --num_epochs=500 \
    --learning_rate=5e-4 \
    --num_classes=14 \
    --weight_std=True \
    --deep_up=True \
    --random_mirror=True \
    --random_scale=True \
    --weight_gan=1e-3 \
    --augmask=2 \
    --pretrain_epoch=20 \
    --val_pred_every=50 \
    --atlas_path=${ATLAS:-atlas_mm.npy} \
    --supervision_csv=${SUP_CSV:-supervise_mask.csv} \
    --mesh="$MESH" \
    ${EXTRA_ARGS:-} 2>&1 | tee -a "$LOGFILE"
