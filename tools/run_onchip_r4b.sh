#!/bin/bash
# Round-4 queue B: same-session unfused baseline (cross-day drift check),
# xpack on the loss recipes, and the bf16 buddy timing rows.
set -u
set -o pipefail
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
cd /root/repo
LOG=/tmp/onchip_r4b.log
echo "=== onchip r4b queue start $(date -u) ===" >> "$LOG"
run() {
  echo "--- $* $(date -u +%H:%M:%S)" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
}
run env BENCH_TRUNK=unfused python bench.py
run env BENCH_TRUNK=xpack python bench.py --only gram-vgg
run env BENCH_TRUNK=xpack python bench.py --only flagship-st
run python tools/bench_buddy.py
echo "=== onchip r4b queue done $(date -u) ===" >> "$LOG"
