#!/bin/bash
# End-of-round-3 chain: wait for the in-flight std+acc_se PT reruns (TPU)
# and the production-ladder CPU prepass, then run the production-precision
# PT point reruns, regenerate the parity matrix, and commit the result.
#
# Usage: bash scripts/round3_finalize.sh <std_pid> <ladder_pid> [<ladder_pid>...]
set -u
cd /root/repo
LOG=logs/round3_finalize.log

for PID in "$@"; do
  echo "waiting for pid $PID..." >> "$LOG"
  while kill -0 "$PID" 2>/dev/null; do sleep 30; done
done

echo "=== production PT points $(date -u +%H:%M:%S) ===" >> "$LOG"
for attempt in 1 2 3; do
  python scripts/pt_production_points.py --production_only >> "$LOG" 2>&1
  left=$(python scripts/pt_production_points.py --production_only --list \
         | grep -c " [1-9][0-9]*/" || true)
  [ "$left" = "0" ] && break
  sleep 120
done

echo "=== regenerate matrix $(date -u +%H:%M:%S) ===" >> "$LOG"
python scripts/summarize_parity.py --write >> "$LOG" 2>&1

git add data/parity_r2 data/parity_r3 docs/PARITY_MATRIX.md
git commit -q -m "Parity-r3: production-ladder + acc_se PT point reruns; regenerated matrix" \
  >> "$LOG" 2>&1 || echo "nothing to commit" >> "$LOG"
echo "=== finalize done $(date -u +%H:%M:%S) ===" >> "$LOG"
