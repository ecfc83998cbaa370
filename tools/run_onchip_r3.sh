#!/bin/bash
# Round-3 on-chip measurement queue. Run when the axon chip is claimable
# (a tiny jit returns in ~1s). Each step appends to /tmp/onchip_r3.log.
# Sequential on purpose: parallel compiles serialize in the tunnel, and
# heavy host work during a compile slows it (CLAUDE.md).
set -u
export PYTHONPATH=/root/repo:$PYTHONPATH
cd /root/repo
LOG=/tmp/onchip_r3.log
echo "=== onchip r3 queue start $(date -u) ===" >> "$LOG"

run() {
  echo "--- $* $(date -u +%H:%M:%S)" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
}

# 1. trunk-mode A/B at the headline config (VERDICT item 2)
run env BENCH_TRUNK=unfused python bench.py
run env BENCH_TRUNK=packed python bench.py
# 1b. gram-vgg frozen-pair A/B (VERDICT item 5 attribution)
run env BENCH_VGG_PAIR=0 python bench.py --only gram-vgg
run env BENCH_VGG_PAIR=1 python bench.py --only gram-vgg
# 2. buddy-select large-shape sweep (kernel value claim)
run python tools/bench_buddy.py
# 3. serving row (new in r3)
run python bench.py --only infer-4k
# 4. full suite refresh: headline + flagship + gram-vgg (frozen pair) + e2e
run python bench.py --suite

echo "=== onchip r3 queue done $(date -u) ===" >> "$LOG"
