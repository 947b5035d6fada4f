#!/bin/bash
# Round-5 window-6: full bench with the packed-permute default ->
# refresh BENCH_mid.json; then the bounce-2 shadow-sort A/B probe.
set -u
cd /root/repo
mkdir -p artifacts/r5_device6

run() {
  local name="$1"; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  timeout "${STEP_TIMEOUT:-5400}" "$@" > "artifacts/r5_device6/$name.log" 2>&1
  local rc=$?
  tail -12 "artifacts/r5_device6/$name.log"
  echo "=== $name rc=$rc ==="
}

run bench_full python bench.py
tail -1 artifacts/r5_device6/bench_full.log | grep '"metric"' > BENCH_mid.json || true
echo "RUNBOOK10 DONE $(date)"
