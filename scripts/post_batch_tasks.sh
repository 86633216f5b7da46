#!/bin/bash
# Chained TPU tasks to run once the RWM parity batch runner exits.
#
#  1. 64-realization ensemble reruns of the two low-dim Scaled 100k
#     families whose single-seed reference curves sit at the edge of the
#     16-realization band — the larger ensemble pins the quantile of the
#     reference's one committed realization draw.
#  2. The PT production-precision point reruns (ladders come from the
#     CPU-built cache, so each point is seconds of chip time).
#
# Usage: bash scripts/post_batch_tasks.sh <pid> [<pid> ...]
#   waits for ALL given pids (RWM batch runner + ladder-cache workers) so
#   the PT runs find every production ladder cached and the chip idle
set -u
cd /root/repo
LOG=logs/post_batch.log

RUNNER="${1:-}"; shift || true
if [ -n "$RUNNER" ]; then
  echo "waiting for runner pid $RUNNER..." >> "$LOG"
  while kill -0 "$RUNNER" 2>/dev/null; do sleep 60; done
fi

# (d2_100000 dropped: it passes its z bar via the honest 15-seed
# realization spread; its R=64 rerun hung during a flaky-tunnel window)
for fam in RoughCarpetScaled_Normal_RWM_GPU_dim5_100000iters; do
  f="data/parity_r3/$fam.json"
  if [ -f "$f" ] && ! grep -q '"target_realizations": 64' "$f"; then
    mv "$f" "$f.r16bak"
    echo "=== $fam at 64 realizations $(date -u +%H:%M:%S) ===" >> "$LOG"
    if ! python scripts/parity_batch.py --family "$fam" \
         --realizations 64 >> "$LOG" 2>&1; then
      echo "=== rerun failed; restoring 16-realization row ===" >> "$LOG"
      [ -f "$f" ] || mv "$f.r16bak" "$f"
    fi
    rm -f "$f.r16bak"
  fi
done

# the PT points need the full ladder cache: wait for the CPU workers
for WAIT_PID in "$@"; do
  echo "waiting for ladder worker pid $WAIT_PID..." >> "$LOG"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
done

echo "=== PT production points $(date -u +%H:%M:%S) ===" >> "$LOG"
for attempt in 1 2 3; do
  python scripts/pt_production_points.py >> "$LOG" 2>&1
  left=$(python scripts/pt_production_points.py --list | grep -c " [1-9][0-9]*/" || true)
  [ "$left" = "0" ] && break
  sleep 300
done
echo "=== post-batch tasks done $(date -u +%H:%M:%S) ===" >> "$LOG"
