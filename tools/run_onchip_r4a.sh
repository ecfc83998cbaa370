#!/bin/bash
# Round-4 on-chip queue A: xpack trunk A/B + buddy-precision-fix refresh.
# Sequential on purpose (CLAUDE.md: parallel compiles serialize in the
# tunnel). Appends to /tmp/onchip_r4a.log.
set -u
set -o pipefail
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
cd /root/repo
LOG=/tmp/onchip_r4a.log
echo "=== onchip r4a queue start $(date -u) ===" >> "$LOG"
run() {
  echo "--- $* $(date -u +%H:%M:%S)" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
}
run env BENCH_TRUNK=xpack python bench.py
run python bench.py --only gram-vgg
run python bench.py --only flagship-st
echo "=== onchip r4a queue done $(date -u) ===" >> "$LOG"
