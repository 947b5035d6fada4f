#!/bin/bash
# Round-4 runbook part 3: treelet-fate experiments with the Mosaic-fixed
# counting-scatter kernel, plus the plain lax.sort regroup variant —
# today's device window shows XLA sort at ~9 ns/elem (10x better than the
# round-3 contended numbers), which ROADMAP said makes the treelet
# pipeline a candidate win as-built. Chained after runbook2 (single TPU
# process rule).
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

run regroup2 python experiments/regroup_bench.py
run treelet_sort env LOUPIOTE_TREELET=1 python experiments/treelet_bench.py both
run treelet_count env LOUPIOTE_TREELET=1 LOUPIOTE_REGROUP=count \
    python experiments/treelet_bench.py both
echo "RUNBOOK3 DONE $(date)"
