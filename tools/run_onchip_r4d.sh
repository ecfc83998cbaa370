#!/bin/bash
# Round-4 queue D: fresh per-op profiles with the round-4 defaults wired
# in (xpack trunk, raw-bf16-dot buddy select) — the data for the
# headline/gram-vgg speed-of-light tables (PERF.md).
set -u
set -o pipefail
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
cd /root/repo
LOG=/tmp/onchip_r4d.log
echo "=== onchip r4d queue start $(date -u) ===" >> "$LOG"
run() {
  echo "--- $* $(date -u +%H:%M:%S)" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
}
run python tools/profile_step.py headline 40
run python tools/profile_step.py gram-vgg 40
run python tools/profile_step.py infer-4k 40
echo "=== onchip r4d queue done $(date -u) ===" >> "$LOG"
