#!/bin/bash
# Round-4 runbook follow-up: the config sweeps need the saved arch-260k
# wave (/tmp/subpacket_wave.npz regenerates per round — /tmp is wiped).
# Waits for the main runbook (single TPU process rule), generates the
# wave on device, then runs the width x leaf_rows x drain A/B.
set -u
cd /root/repo
mkdir -p /tmp/runbook

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

run() {
  local name="$1"; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  timeout "${STEP_TIMEOUT:-3600}" "$@" > "/tmp/runbook/$name.log" 2>&1
  local rc=$?
  tail -5 "/tmp/runbook/$name.log"
  echo "=== $name rc=$rc ==="
}

run wave python experiments/subpacket_sweep.py wave
run sweep_diffuse python experiments/r4_config_sweep.py diffuse
run sweep_shadow python experiments/r4_config_sweep.py shadow
echo "RUNBOOK2 DONE $(date)"
