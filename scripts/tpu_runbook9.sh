#!/bin/bash
# Round-5 window-5 runbook: sort-cost levers A/B (packed permute,
# sort_max), shadow-split trace attribution, verify drive on the tree.
set -u
cd /root/repo
mkdir -p artifacts/r5_device5

run() {
  local name="$1"; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  timeout "${STEP_TIMEOUT:-5400}" "$@" > "artifacts/r5_device5/$name.log" 2>&1
  local rc=$?
  tail -12 "artifacts/r5_device5/$name.log"
  echo "=== $name rc=$rc ==="
}

run frame_sort_cost_ab python experiments/frame_sort_cost_ab.py
run arch_trace2 python experiments/arch_trace_attrib.py
run verify_drive python scripts/verify_tpu.py
echo "RUNBOOK9 DONE $(date)"
