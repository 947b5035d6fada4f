#!/bin/bash
# Round-5 window-2 runbook: (1) packed-reduce kernel A/B on the saved
# waves, (2) sort-key frame A/B, (3) trace-based per-pass timing
# validation, (4) cross-process compile-cache probe via two back-to-back
# headline bench runs, (5) textured+instanced bench smoke.
# ONE process talks to the TPU at a time (tunnel rule, bench.py header).
set -u
cd /root/repo
mkdir -p artifacts/r5_device2

run() {
  local name="$1"; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  timeout "${STEP_TIMEOUT:-3600}" "$@" > "artifacts/r5_device2/$name.log" 2>&1
  local rc=$?
  tail -12 "artifacts/r5_device2/$name.log"
  echo "=== $name rc=$rc ==="
}

run wave python experiments/subpacket_sweep.py wave
run kernel_ab_diffuse env LOUPIOTE_R4B_CFGS="64:,64:minred" \
    python experiments/r4b_sweep.py diffuse
run kernel_ab_shadow env LOUPIOTE_R4B_CFGS="64:,64:minred" \
    python experiments/r4b_sweep.py shadow
run trace_passes python experiments/trace_passes_tpu.py
run frame_key_ab python experiments/frame_key_ab.py
run cache_probe_a env LOUPIOTE_BENCH_SECTIONS=headline python bench.py
run cache_probe_b env LOUPIOTE_BENCH_SECTIONS=headline python bench.py
run bench_textured env LOUPIOTE_BENCH_SECTIONS=textured python bench.py
run bench_instanced env LOUPIOTE_BENCH_SECTIONS=instanced python bench.py
echo "RUNBOOK6 DONE $(date)"
