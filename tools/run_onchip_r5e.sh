#!/bin/bash
# Round-5 queue E (armed watcher): waits for the chip to become
# claimable (single clean-exit probe loop, spaced — never timeout-kill a
# claim, ROUND3.md wedge note), then runs the full remaining on-chip
# program in one session:
#   1. serving-tail verify drive (value parity vs the default eval path)
#   2. r5d: tail A/B + POOL_BF16 consumer-cost A/B
#   3. r5b: headline + gram-vgg post-xpack profiles, bf16 trajectory
#      smoke, stream bound
set -u
set -o pipefail
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
cd /root/repo
LOG=/tmp/onchip_r5e.log
echo "=== r5e watcher start $(date -u) ===" >> "$LOG"

# ---- phase 0: wait for the chip (clean-exit probes, 5 min apart) ----
for attempt in $(seq 1 40); do
  echo "--- probe $attempt $(date -u +%H:%M:%S)" >> "$LOG"
  if python - >> "$LOG" 2>&1 <<'EOF'
import time, jax, jax.numpy as jnp
t0 = time.time()
x = jax.jit(lambda a: a * 7 + 1)(jnp.ones((8, 128)))
dt = time.time() - t0
print(f"probe jit ok: {float(x.sum())} in {dt:.1f} s", flush=True)
import sys
sys.exit(0 if dt < 120 else 2)  # rc 2: alive but still serialized
EOF
  then
    echo "--- chip responsive, starting measurement program" >> "$LOG"
    break
  fi
  sleep 300
done

run() {
  echo "--- $* $(date -u +%H:%M:%S)" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
}

# ---- phase 1: serving-tail verify drive ----
run python tools/verify_tail_onchip.py

# ---- phase 2: tail + consumer A/Bs ----
run python tools/bench_serving.py tail inner1
run env POOL_BF16=1 python tools/bench_serving.py tail inner1

# ---- phase 3: r5b program ----
run python tools/profile_step.py headline 40
run python tools/profile_step.py gram-vgg 40
run python tools/onchip_trajectory_smoke.py --bf16
run python tools/bench_stream.py
echo "=== r5e watcher done $(date -u) ===" >> "$LOG"
