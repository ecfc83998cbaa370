#!/bin/bash
# Round-5 queue B (VERDICT items 2 + 3 + 4a + 5): post-xpack training
# profiles, the shipping-bf16 trajectory smoke, and the stream bound.
#  1. per-op profile of the shipping headline step (post-xpack — PERF.md
#     §2 still shows the 5,074-era breakdown).
#  2. per-op profile of the gram-vgg recipe (post-xpack).
#  3. tools/onchip_trajectory_smoke.py --bf16 — the bf16+xpack+raw-buddy
#     recipe every headline number ships on gets its own trajectory gate.
#  4. tools/bench_stream.py — bound e2e-stream against the raw link.
set -u
set -o pipefail
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
cd /root/repo
LOG=/tmp/onchip_r5b.log
echo "=== onchip r5b queue start $(date -u) ===" >> "$LOG"
run() {
  echo "--- $* $(date -u +%H:%M:%S)" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
}
run python tools/profile_step.py headline 40
run python tools/profile_step.py gram-vgg 40
run python tools/onchip_trajectory_smoke.py --bf16
run python tools/bench_stream.py
echo "=== onchip r5b queue done $(date -u) ===" >> "$LOG"
