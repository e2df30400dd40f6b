#!/bin/bash
# Kill the campaign trainer child (by PPID, never by pattern) when its log
# stops advancing for >STALL_S seconds; run_campaign_chunks.sh then resumes
# the chunk from the latest checkpoint. Guards against silent axon-tunnel
# hangs (observed: main thread futex-parked, axon-conn-read waiting forever).
LOG="${1:?log}"; LOOP_PID="${2:?loop pid}"; STALL_S="${3:-420}"
# A freshly spawned trainer is silent while it compiles the fused step —
# up to ~10 min cold on a contended host. Killing it then restarts the
# compile forever (observed round 3: chunk 1 killed at 420s mid-compile).
# Grant every child a compile grace before the stall rule applies.
GRACE_S="${4:-900}"
while kill -0 "$LOOP_PID" 2>/dev/null; do
  sleep 60
  [ -f "$LOG" ] || continue
  age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
  if [ "$age" -gt "$STALL_S" ]; then
    child=$(ps --ppid "$LOOP_PID" -o pid= | head -1 | tr -d ' ')
    if [ -n "$child" ]; then
      child_age=$(ps -o etimes= -p "$child" 2>/dev/null | tr -d ' ')
      if [ -n "$child_age" ] && [ "$child_age" -lt "$GRACE_S" ]; then
        continue
      fi
      echo "[watchdog $(date +%H:%M:%S)] log stalled ${age}s — killing trainer $child" >> "$LOG"
      kill "$child" 2>/dev/null
      sleep 30
      kill -9 "$child" 2>/dev/null
    fi
  fi
done
