#!/bin/bash
# Round-3 queue part L: after part K, attribute the epoch-e2e gap (host
# assembly vs H2D vs device scan — tools/e2e_profile.py) and take a final
# clean bench for the round record.
set -u
cd /root/repo
STATUS=logs/queue_r3.status
note() { echo "$(date +%H:%M:%S) [L] $*" >> "$STATUS"; }

WAIT_PID="${1:?usage: run_queue_r3l.sh <partK-pid>}"
note "part L waiting for part K pid $WAIT_PID"
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done

note "e2e profile starting"
env PYTHONPATH=/root/repo:/root/.axon_site python tools/e2e_profile.py \
  > logs/e2e_profile_r3l.log 2>&1
note "e2e profile rc=$? tail=$(tail -1 logs/e2e_profile_r3l.log)"

note "final clean bench"
python bench.py > logs/bench_r3l_final.log 2>&1
note "final bench rc=$? last=$(tail -1 logs/bench_r3l_final.log)"
note "=== part L complete ==="
