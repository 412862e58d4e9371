#!/bin/bash
# Round-3 queue part F: after part E, validate the fixed scanned-bench
# synchronization on a quiet chip (part C's run exposed that
# block_until_ready through the axon relay can return before remote
# execution completes, yielding a physically impossible 444k pairs/s; the
# bench now syncs via a D2H fetch and hard-fails on mfu>1).
set -u
cd /root/repo
STATUS=logs/queue_r3.status
note() { echo "$(date +%H:%M:%S) [F] $*" >> "$STATUS"; }

WAIT_PID="${1:?usage: run_queue_r3f.sh <partE-pid>}"
note "part F waiting for part E pid $WAIT_PID"
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done

note "fixed-sync bench starting"
python bench.py > logs/bench_r3_fixedsync.log 2>&1
note "fixed-sync bench rc=$? last=$(tail -1 logs/bench_r3_fixedsync.log)"
note "=== part F complete ==="
