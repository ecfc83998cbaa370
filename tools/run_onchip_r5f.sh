#!/bin/bash
# Round-5 queue F (chained watcher): waits for queue E to finish, then
# drives the REBUILT fused serving tail (kernels/serving_tail.py — the
# first build was lost uncommitted to a VM reset, ROUND5.md) and the
# training-scale conv3 A/B the fresh headline profile motivates (~360
# us/step of custom-call + layout-copy time around the one-block Pallas
# conv3; the serving log proved the same disease end-to-end at 4K).
set -u
set -o pipefail
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
cd /root/repo
LOG=/tmp/onchip_r5f.log
echo "=== r5f watcher start $(date -u) ===" >> "$LOG"

# ---- phase 0: wait for queue E to drain (clean-exit poll, no kills) ----
for attempt in $(seq 1 120); do
  if grep -q "r5e watcher done" /tmp/onchip_r5e.log 2>/dev/null; then
    echo "--- queue E done, starting $(date -u +%H:%M:%S)" >> "$LOG"
    break
  fi
  sleep 60
done

run() {
  echo "--- $* $(date -u +%H:%M:%S)" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
}

# ---- phase 1: serving-tail verify drive (value parity on-chip) ----
run python tools/verify_tail_onchip.py

# ---- phase 2: serving A/Bs (tail kernel; pool-consumer dtype) ----
run python tools/bench_serving.py inner1 tail
run env POOL_BF16=1 python tools/bench_serving.py inner1 tail

# ---- phase 3: training-scale conv3 A/B (auto/pallas vs XLA coarse) ----
run env BENCH_CONV3=1 python bench.py --only headline
run python bench.py --only headline
echo "=== r5f watcher done $(date -u) ===" >> "$LOG"
