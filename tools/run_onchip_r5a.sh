#!/bin/bash
# Round-5 queue A (VERDICT items 1 + 6): serving workstream data and
# buddy-timing evidence hygiene.
#  1. tools/bench_buddy.py full sweep — clean post-discipline bf16 timing
#     lines superseding ONCHIP_r04_xpack_ab2.log's warmup-bleed artifacts.
#  2. per-op profile of the shipping infer-4k serving forward (base).
#  3. the serving variant A/B matrix (stem x trunk x conv3 factorings).
set -u
set -o pipefail
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
cd /root/repo
LOG=/tmp/onchip_r5a.log
echo "=== onchip r5a queue start $(date -u) ===" >> "$LOG"
run() {
  echo "--- $* $(date -u +%H:%M:%S)" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
}
run python tools/bench_buddy.py
run python tools/profile_step.py infer-4k 40
run python tools/bench_serving.py base inner1 unfused xev stem stem-xev
echo "=== onchip r5a queue done $(date -u) ===" >> "$LOG"
