#!/bin/bash
# Round-4 queue C: raw-bf16-dot buddy timing check, then the full suite
# refresh with the new defaults (auto trunk=xpack for bf16, raw-dot buddy).
set -u
set -o pipefail
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
cd /root/repo
LOG=/tmp/onchip_r4c.log
echo "=== onchip r4c queue start $(date -u) ===" >> "$LOG"
run() {
  echo "--- $* $(date -u +%H:%M:%S)" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
}
run python tools/verify_warmup_xpack.py
run python tools/bench_buddy.py --check
run python bench.py --suite
echo "=== onchip r4c queue done $(date -u) ===" >> "$LOG"
