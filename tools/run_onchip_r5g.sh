#!/bin/bash
# Round-5 queue G (final refresh): full bench suite on the shipping
# defaults (records the post-gate-fix headline + serving rows), then
# the post-xpack batch-scaling ladder for PERF.md §5.
set -u
set -o pipefail
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
cd /root/repo
LOG=/tmp/onchip_r5g.log
echo "=== r5g start $(date -u) ===" >> "$LOG"
run() {
  echo "--- $* $(date -u +%H:%M:%S)" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
}
run python bench.py --suite
run env BENCH_BATCH=32 python bench.py --only headline
run env BENCH_BATCH=64 python bench.py --only headline
run env BENCH_BATCH=128 python bench.py --only headline
echo "=== r5g done $(date -u) ===" >> "$LOG"
