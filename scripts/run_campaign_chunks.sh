#!/bin/bash
# Chunked partial-label campaign: checkpoint/resume in --stop_epoch chunks.
# With --device_data the axon transfer-buffer leak is moot (per-step H2D is
# bytes), so chunks exist only as crash insurance; each chunk resumes from
# the latest orbax checkpoint and the LR schedule horizon stays --num_epochs.
#
# The axon tunnel can also HANG silently (main thread futex-parked while
# axon-conn-read waits forever on the socket — observed round 3, epoch 538),
# which a crash-retry loop cannot detect. Pair this runner with
# scripts/campaign_watchdog.sh, which kills the trainer child whenever the
# log stops advancing so this loop's retry kicks in:
#   nohup bash scripts/run_campaign_chunks.sh ROOT T C > LOG 2>&1 &
#   nohup scripts/campaign_watchdog.sh LOG $! 420 >/dev/null 2>&1 &
# Usage: run_campaign_chunks.sh [ROOT=/tmp/synth_pl] [TOTAL=2500] [CHUNK=800] [STEPS_PER_EPOCH=6]
set -u
ROOT="${1:-/tmp/synth_pl}"
TOTAL="${2:-2500}"
CHUNK="${3:-800}"
SNAP="$ROOT/snapshots"
# 6 = ceil(19 train cases / bs 3) for the 28-case multimodal set;
# the 22-case CT-only set has 15 train cases -> 5
STEPS_PER_EPOCH="${4:-6}"

while true; do
  latest=$(ls "$SNAP" 2>/dev/null | grep '^ckpt_' | sed 's/ckpt_//' | sort -n | tail -1)
  start=$(( ${latest:-0} / STEPS_PER_EPOCH ))
  if [ "$start" -ge "$TOTAL" ]; then echo "campaign complete at epoch $start"; break; fi
  stop=$(( start + CHUNK )); [ "$stop" -gt "$TOTAL" ] && stop=$TOTAL
  echo "=== chunk: epochs $start -> $stop ==="
  python -m multimodal_pl_tpu.cli.train \
    --data_dir "$ROOT/imagesTr" \
    --atlas_path "$ROOT/atlas_mm.npy" \
    --supervision_csv "$ROOT/supervise_mask.csv" \
    --snapshot_dir "$SNAP" \
    --input_size 64,96,96 --batch_size 3 \
    --num_epochs "$TOTAL" --val_pred_every 100 \
    --learning_rate 5e-4 --pretrain_epoch 20 --cache_data true \
    --device_data true \
    --reload_from_checkpoint true --start_epoch "$start" --stop_epoch "$stop" \
    || { echo "chunk failed (rc=$?)"; sleep 120; }
    # 120 s with ZERO clients: a wedged axon tunnel (round-3 observation)
    # only resets once every client connection is gone for a while — an
    # immediate respawn reconnects into the wedge and hangs again.
done
