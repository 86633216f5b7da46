#!/bin/bash
# Resilient chained parity-batch runner.
#
# Waits for the given PID (current TPU occupant) to exit, then loops
# scripts/parity_batch.py until the uncovered-RWM queue is drained.
# The batch script is resumable (skips families whose output JSON exists in
# data/parity_r3), so a transient TPU device error only costs the
# in-flight family; we retry unless a pass makes no progress twice in a row.
set -u
cd /root/repo
WAIT_PID="${1:-}"
LOG=logs/parity_batch_r3c.log

if [ -n "$WAIT_PID" ]; then
  echo "waiting for pid $WAIT_PID to exit..." >> "$LOG"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

stall=0
for attempt in $(seq 1 40); do
  before=$(ls data/parity_r3/*.json 2>/dev/null | wc -l)
  echo "=== attempt $attempt (completed: $before) $(date -u +%H:%M:%S) ===" >> "$LOG"
  python scripts/parity_batch.py >> "$LOG" 2>&1
  rc=$?
  after=$(ls data/parity_r3/*.json 2>/dev/null | wc -l)
  if [ "$rc" -eq 0 ]; then
    echo "=== batch exited clean (completed: $after) ===" >> "$LOG"
    break
  fi
  if [ "$after" -le "$before" ]; then
    stall=$((stall + 1))
    if [ "$stall" -ge 4 ]; then
      echo "=== no progress four times in a row; giving up ===" >> "$LOG"
      break
    fi
    sleep 600   # let a transient TPU fault clear
  else
    stall=0
  fi
done
echo "=== chain runner done $(date -u +%H:%M:%S) ===" >> "$LOG"
