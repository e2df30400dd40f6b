#!/bin/bash
# Kill the campaign trainer child (by PPID, never by pattern) when its log
# stops advancing for >STALL_S seconds; run_campaign_chunks.sh then resumes
# the chunk from the latest checkpoint. Guards against silent axon-tunnel
# hangs (observed: main thread futex-parked, axon-conn-read waiting forever).
LOG="${1:?log}"; LOOP_PID="${2:?loop pid}"; STALL_S="${3:-420}"
# A freshly spawned trainer is silent while it compiles the fused step —
# up to ~10 min cold on a contended host. Killing it then restarts the
# compile forever (observed round 3: chunk 1 killed at 420s mid-compile).
# Grant every child a compile grace before the stall rule applies — but only
# while that child has NEVER advanced the log (advisor r3): grace is keyed to
# "has this PID produced output yet", not to raw process age, so a trainer
# that logs once and then hangs is recovered by the normal stall rule.
GRACE_S="${4:-900}"
graced_pid=""          # child currently under compile grace
graced_first_seen=0    # when we first saw it
graced_log_mtime=0     # log mtime at first sight; any advance ends the grace
while kill -0 "$LOOP_PID" 2>/dev/null; do
  sleep 60
  [ -f "$LOG" ] || continue
  now=$(date +%s)
  mtime=$(stat -c %Y "$LOG")
  age=$(( now - mtime ))
  if [ "$age" -gt "$STALL_S" ]; then
    # Pick the python trainer child specifically — the chunk loop also
    # parents sleeps during its cooldown window (advisor r3).
    child=$(ps --ppid "$LOOP_PID" -o pid=,comm= 2>/dev/null \
              | awk '$2 ~ /python/ {print $1; exit}')
    if [ -n "$child" ]; then
      if [ "$child" != "$graced_pid" ]; then
        graced_pid="$child"; graced_first_seen="$now"; graced_log_mtime="$mtime"
      fi
      if [ "$mtime" -le "$graced_log_mtime" ] \
         && [ $(( now - graced_first_seen )) -lt "$GRACE_S" ]; then
        continue  # still compiling: never logged since we first saw it
      fi
      echo "[watchdog $(date +%H:%M:%S)] log stalled ${age}s — killing trainer $child" >> "$LOG"
      kill "$child" 2>/dev/null
      sleep 30
      kill -9 "$child" 2>/dev/null
    fi
  fi
done
