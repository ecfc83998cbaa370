#!/bin/bash
# Round-5 queue D: the fused Pallas serving tail (kernels/serving_tail.py)
# A/B vs the inner1 winner, plus the pool-consumer-cost A/B (POOL_BF16).
set -u
set -o pipefail
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
cd /root/repo
LOG=/tmp/onchip_r5d.log
echo "=== onchip r5d queue start $(date -u) ===" >> "$LOG"
run() {
  echo "--- $* $(date -u +%H:%M:%S)" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
}
run python tools/bench_serving.py tail inner1
run env POOL_BF16=1 python tools/bench_serving.py tail inner1
echo "=== onchip r5d queue done $(date -u) ===" >> "$LOG"
