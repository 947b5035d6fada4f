#!/bin/bash
# Round-5 window-9: cand-TLAS instanced bench + fresh attribution on the
# current defaults (packed permute + shadow self-sort) + DEVICE_CHECKS
# regen. Run AFTER verify_r5_tlas.py (one process per TPU).
set -u
cd /root/repo
mkdir -p artifacts/r5_device9

run() {
  local name="$1"; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  timeout "${STEP_TIMEOUT:-5400}" "$@" > "artifacts/r5_device9/$name.log" 2>&1
  local rc=$?
  tail -12 "artifacts/r5_device9/$name.log"
  echo "=== $name rc=$rc ==="
}

run bench_instanced python bench.py --section instanced
run arch_trace python experiments/arch_trace_attrib.py
run equivalence python experiments/tpu_equivalence.py
echo "RUNBOOK12 DONE $(date)"
