#!/bin/bash
# Round-5 window-4 runbook: measured 1080p frame attribution, then the
# FULL bench (all sections) committed as BENCH_mid.json.
set -u
cd /root/repo
mkdir -p artifacts/r5_device4

run() {
  local name="$1"; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  timeout "${STEP_TIMEOUT:-5400}" "$@" > "artifacts/r5_device4/$name.log" 2>&1
  local rc=$?
  tail -12 "artifacts/r5_device4/$name.log"
  echo "=== $name rc=$rc ==="
}

run arch_trace python experiments/arch_trace_attrib.py
run bench_full python bench.py
tail -1 artifacts/r5_device4/bench_full.log | grep '"metric"' > BENCH_mid.json || true
echo "RUNBOOK8 DONE $(date)"
