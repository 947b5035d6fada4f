#!/bin/bash
# Round-4 runbook part 4 (second device window): frame-glue follow-ups.
#  - regenerate the saved diffuse wave (fresh /tmp on this host)
#  - sub{64,128} x unroll{2,4} wide-kernel sweep (diffuse + shadow)
#  - full-frame argsort-vs-slab-sort A/B (decides the default regroup)
#  - persistent-compile-cache probe (warm compile is 57.8s; dir is empty)
# Chained after a running PID (single TPU process rule):
#   scripts/tpu_runbook4.sh [pid_to_wait_for]
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
  tail -8 "/tmp/runbook/$name.log"
  echo "=== $name rc=$rc ==="
}

run cache_probe python experiments/cache_probe.py
run wave python experiments/subpacket_sweep.py wave
run r4b_diffuse python experiments/r4b_sweep.py diffuse
run r4b_shadow python experiments/r4b_sweep.py shadow
run frame_sort_ab python experiments/frame_sort_ab.py
echo "RUNBOOK4 DONE $(date)"
