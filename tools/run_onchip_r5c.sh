#!/bin/bash
# Round-5 queue C: serving follow-ups after the r5a matrix showed the
# Pallas H-tiled conv3 LOSING 159 vs 69 ms/frame (inner1 = XLA coarse
# conv3 is the winner so far).
#  1. per-op profile of the inner1 path (where do the 69 ms go?)
#  2. combo variants on top of inner1 (stem / xpack trunk / inner2)
#  3. bench_buddy rerun with the new in-graph amortized timing lines
set -u
set -o pipefail
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
cd /root/repo
LOG=/tmp/onchip_r5c.log
echo "=== onchip r5c queue start $(date -u) ===" >> "$LOG"
run() {
  echo "--- $* $(date -u +%H:%M:%S)" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
}
run env SERVE_VARIANT=inner1 python tools/profile_step.py infer-4k 40
run python tools/bench_serving.py inner1-stem inner1-xev inner1-stem-xev inner2
run python tools/bench_buddy.py
echo "=== onchip r5c queue done $(date -u) ===" >> "$LOG"
