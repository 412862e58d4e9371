#!/bin/bash
# Round-3 queue part I: after part H, the batch-size throughput sweep on a
# quiet chip (train-step MFU scaling beyond the recipe's bs 16), then a
# final clean bench for the round record.
set -u
cd /root/repo
STATUS=logs/queue_r3.status
note() { echo "$(date +%H:%M:%S) [I] $*" >> "$STATUS"; }

WAIT_PID="${1:?usage: run_queue_r3i.sh <partH-pid>}"
note "part I waiting for part H pid $WAIT_PID"
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done

note "throughput sweep starting"
env PYTHONPATH=/root/repo:/root/.axon_site python tools/throughput_sweep.py \
  > logs/throughput_sweep_r3.log 2>&1
note "throughput sweep rc=$? tail=$(tail -1 logs/throughput_sweep_r3.log)"

note "final clean bench"
python bench.py > logs/bench_r3_final2.log 2>&1
note "final bench rc=$? last=$(tail -1 logs/bench_r3_final2.log)"
note "=== part I complete ==="
