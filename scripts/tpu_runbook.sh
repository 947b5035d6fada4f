#!/bin/bash
# Round-4 device runbook (VERDICT r3 #1): run IN ORDER the moment the TPU
# tunnel is back; every step logs to /tmp/runbook/ and is fail-soft. The
# bench JSON is committed IMMEDIATELY as BENCH_mid.json so no tunnel
# outage can leave the round unverified again.
#
# Keep at most ONE process talking to the TPU (the remote-compile service
# stalls for tens of minutes under load) — steps run sequentially.
set -u
cd /root/repo
mkdir -p /tmp/runbook

run() {
  local name="$1"; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  timeout "${STEP_TIMEOUT:-3600}" "$@" > "/tmp/runbook/$name.log" 2>&1
  local rc=$?
  tail -5 "/tmp/runbook/$name.log"
  echo "=== $name rc=$rc ==="
}

# 1. End-to-end render on hardware (verify-skill drive, TPU path).
run verify python scripts/verify_tpu.py

# 2. Kernel config sweep: drain A/B + width x leaf_rows (the round-4
#    step-count levers; sim says w16/lr4 = -40% steps).
run sweep_diffuse python experiments/r4_config_sweep.py diffuse
run sweep_shadow python experiments/r4_config_sweep.py shadow

# 3. Counting-scatter regroup decision (VERDICT r3 #6): >= 2x over
#    lax.sort unlocks treelet phase 2, else the tower moves out.
run regroup python experiments/regroup_bench.py
run treelet_ab env LOUPIOTE_TREELET=1 LOUPIOTE_REGROUP=count \
    python experiments/treelet_bench.py both

# 4. Interactive frame: BVH2 sub sweep + frame glue attribution.
run cornell_sub python experiments/cornell_sub.py
run frame_parts python experiments/frame_parts.py

# 5. Slab-sort frame A/B (the ~410 ms glue replacement).
run frame_slab env LOUPIOTE_SLAB_SORT=1 python experiments/frame_parts.py

# 6. Device equivalence gate on the shipped defaults.
run equivalence python experiments/tpu_equivalence.py

# 7. Headline bench; commit the artifact IMMEDIATELY.
run bench python bench.py
if [ -s /tmp/runbook/bench.log ]; then
  tail -1 /tmp/runbook/bench.log > BENCH_mid.json
  git add BENCH_mid.json && git commit -m "Record mid-round device bench artifact (BENCH_mid.json)"
fi
echo "RUNBOOK DONE $(date)"
