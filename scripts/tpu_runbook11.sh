#!/bin/bash
# Round-5 window-7: shadow self-sort frame A/B + verify drive.
set -u
cd /root/repo
mkdir -p artifacts/r5_device7

run() {
  local name="$1"; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  timeout "${STEP_TIMEOUT:-5400}" "$@" > "artifacts/r5_device7/$name.log" 2>&1
  local rc=$?
  tail -12 "artifacts/r5_device7/$name.log"
  echo "=== $name rc=$rc ==="
}

run frame_shadow_ab python experiments/frame_shadow_ab.py
run verify_drive python scripts/verify_tpu.py
echo "RUNBOOK11 DONE $(date)"
