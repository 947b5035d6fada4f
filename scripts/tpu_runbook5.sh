#!/bin/bash
# Round-4 runbook part 5 (post-fix): real unroll4 A/B (the kernel ignored
# the "unroll4" ablate until now — runbook4's unroll4 rows silently ran
# the default 2x), shadow sub/unroll A/B, frame sort A/B, then the full
# bench with the round's validated defaults.
set -u
cd /root/repo
mkdir -p /tmp/runbook

run() {
  local name="$1"; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  timeout "${STEP_TIMEOUT:-3600}" "$@" > "/tmp/runbook/$name.log" 2>&1
  local rc=$?
  tail -8 "/tmp/runbook/$name.log"
  echo "=== $name rc=$rc ==="
}

run r4b2_diffuse env LOUPIOTE_R4B_CFGS="64:,64:unroll4" \
    python experiments/r4b_sweep.py diffuse
run r4b2_shadow env LOUPIOTE_R4B_CFGS="64:,64:unroll4" \
    python experiments/r4b_sweep.py shadow
run frame_sort_ab python experiments/frame_sort_ab.py
echo "RUNBOOK5 DONE $(date)"
