#!/bin/bash
# Round-5 window-3 runbook: trace-based per-pass timing validation (fixed
# driver call), AOT executable serialization probe (the cross-process
# compile-stall workaround), the spp=4 batched headline measurement, and
# a fresh verify drive covering the spp integrator changes.
set -u
cd /root/repo
mkdir -p artifacts/r5_device3

run() {
  local name="$1"; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  timeout "${STEP_TIMEOUT:-3600}" "$@" > "artifacts/r5_device3/$name.log" 2>&1
  local rc=$?
  tail -12 "artifacts/r5_device3/$name.log"
  echo "=== $name rc=$rc ==="
}

run trace_passes python experiments/trace_passes_tpu.py
run aot_probe python experiments/aot_probe.py
run bench_spp env LOUPIOTE_BENCH_SECTIONS=spp python bench.py
run bench_instanced env LOUPIOTE_BENCH_SECTIONS=instanced python bench.py
run verify_drive python scripts/verify_tpu.py
echo "RUNBOOK7 DONE $(date)"
