#!/bin/bash
# Round-3 on-chip measurement queue. Run when the axon chip is claimable
# (a tiny jit returns in ~1s). Each step appends to /tmp/onchip_r3.log.
# Sequential on purpose: parallel compiles serialize in the tunnel, and
# heavy host work during a compile slows it (CLAUDE.md).
#
# After the trunk-mode and VGG-pair A/Bs, the winning knobs are picked
# automatically and the final --suite refresh runs with them, so one
# pass of this script yields the final BENCH_SUITE numbers (defaults in
# the code are flipped afterwards, by hand, to match the measurements).
# An A/B leg that fails (rc != 0) or reports no throughput yields an
# INCONCLUSIVE verdict and the suite runs with the in-code defaults —
# a degraded run must never pin a knob.
set -u
set -o pipefail
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
cd /root/repo
LOG=/tmp/onchip_r3.log
echo "=== onchip r3 queue start $(date -u) ===" >> "$LOG"

run() {
  echo "--- $* $(date -u +%H:%M:%S)" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
}

# run + capture the bench JSON "value" into the named variable ($1).
# stdout streams to the log live (tee) so multi-minute compiles remain
# distinguishable from a wedged TPU; a non-zero rc forces value=0.
runv() {
  local __var=$1; shift
  echo "--- $* $(date -u +%H:%M:%S)" >> "$LOG"
  local out rc
  out=$("$@" 2>>"$LOG" | tee -a "$LOG")
  rc=$?
  echo "--- rc=$rc $(date -u +%H:%M:%S)" >> "$LOG"
  local val=0
  if [ "$rc" -eq 0 ]; then
    val=$(printf '%s\n' "$out" | python3 -c '
import json, sys
v = 0.0
for line in sys.stdin:
    line = line.strip()
    if line.startswith("{"):
        try: v = json.loads(line).get("value", 0.0)
        except Exception: pass
print(v)')
  fi
  printf -v "$__var" '%s' "$val"
}

SUITE_ENV=()

# 1. trunk-mode A/B at the headline config (VERDICT item 2)
runv V_UNFUSED env BENCH_TRUNK=unfused python bench.py
runv V_PACKED env BENCH_TRUNK=packed python bench.py
TRUNK_WIN=$(python3 -c "
u, p = ${V_UNFUSED:-0}, ${V_PACKED:-0}
print(('packed' if p > u else 'unfused') if u > 0 and p > 0 else '')")
if [ -n "$TRUNK_WIN" ]; then
  SUITE_ENV+=("BENCH_TRUNK=${TRUNK_WIN}")
  echo "### trunk A/B: unfused=${V_UNFUSED} packed=${V_PACKED} -> winner=${TRUNK_WIN}" >> "$LOG"
else
  echo "### trunk A/B INCONCLUSIVE (unfused=${V_UNFUSED} packed=${V_PACKED}): suite uses in-code default" >> "$LOG"
fi

# 1b. gram-vgg frozen-pair A/B (VERDICT item 5 attribution)
runv V_VGG2FWD env BENCH_VGG_PAIR=0 python bench.py --only gram-vgg
runv V_VGGPAIR env BENCH_VGG_PAIR=1 python bench.py --only gram-vgg
VGG_WIN=$(python3 -c "
a, b = ${V_VGG2FWD:-0}, ${V_VGGPAIR:-0}
print(('1' if b > a else '0') if a > 0 and b > 0 else '')")
if [ -n "$VGG_WIN" ]; then
  SUITE_ENV+=("BENCH_VGG_PAIR=${VGG_WIN}")
  echo "### vgg pair A/B: two-fwd=${V_VGG2FWD} pair=${V_VGGPAIR} -> BENCH_VGG_PAIR=${VGG_WIN}" >> "$LOG"
else
  echo "### vgg pair A/B INCONCLUSIVE (two-fwd=${V_VGG2FWD} pair=${V_VGGPAIR}): suite uses registry auto" >> "$LOG"
fi

# 2. buddy-select large-shape sweep (kernel value claim)
run python tools/bench_buddy.py
# 3. serving row (new in r3)
run python bench.py --only infer-4k
# 4. full suite refresh with the measured winners (or in-code defaults
#    where an A/B was inconclusive): headline + flagship + gram-vgg + e2e
run env ${SUITE_ENV[@]+"${SUITE_ENV[@]}"} python bench.py --suite

echo "=== onchip r3 queue done $(date -u) ===" >> "$LOG"
