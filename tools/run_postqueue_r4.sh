#!/bin/bash
# Post-queue chip experiments (round 4, after the auto protocol queue exits):
#   1. flat-AdamW A/B on the bench cls tier (DRUGLAMP_FLAT_OPT=1 vs default)
#      - the one staged MFU lever from the roofline audit: the step is
#        bytes-bound, so collapsing the 3 per-leaf AdamW update loops into
#        flat-buffer updates can only win by removing bytes/dispatch overhead.
#   2. cross-transport determinism probe on the real TPU backend
#      (tools/transport_parity.py; the CPU run was bitwise-identical —
#       this answers whether the axon/TPU backend diverges and where).
# Waits for the auto queue (pid file /tmp/queue_r4.pid) to free the chip.
set -u
cd /root/repo
mkdir -p logs
S=logs/postqueue_r4.status
note() { echo "$(date +%H:%M:%S) [pq] $*" >> "$S"; }

QPID=$(cat /tmp/queue_r4.pid 2>/dev/null || echo 0)
note "waiting for auto queue pid $QPID"
while [ "$QPID" != 0 ] && kill -0 "$QPID" 2>/dev/null; do sleep 30; done
note "chip free; starting experiments"

note "flat-AdamW A/B bench (DRUGLAMP_FLAT_OPT=1)"
DRUGLAMP_FLAT_OPT=1 DRUGLAMP_BENCH_BUDGET_S=1 timeout 1500 \
  python bench.py > logs/bench_flatopt_r4.log 2>&1
note "flatopt bench rc=$? headline=$(grep -m1 '"metric"' logs/bench_flatopt_r4.log | head -c 300)"

note "transport parity probe (TPU backend)"
timeout 5400 python tools/transport_parity.py --epochs 3 \
  > logs/transport_parity_tpu.log 2>&1
note "parity rc=$? tail=$(tail -2 logs/transport_parity_tpu.log | head -c 400)"

note "done"
