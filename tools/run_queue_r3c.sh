#!/bin/bash
# Round-3 queue part C: after part B, re-run bench on a QUIET host/chip (the
# in-queue bench ran concurrently with a leftover r2 training + CPU compiles,
# which pollutes dispatch-bound throughput through the tunneled runtime).
set -u
cd /root/repo
STATUS=logs/queue_r3.status
note() { echo "$(date +%H:%M:%S) [C] $*" >> "$STATUS"; }

WAIT_PID="${1:?usage: run_queue_r3c.sh <partB-pid>}"
note "part C waiting for part B pid $WAIT_PID"
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done

note "clean bench starting"
python bench.py > logs/bench_r3_final.log 2>&1
note "clean bench rc=$? last=$(tail -1 logs/bench_r3_final.log)"
note "=== part C complete ==="
