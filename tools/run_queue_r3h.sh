#!/bin/bash
# Round-3 queue part H: quiet-chip A/B of the packed-GCN kernel at the
# official bench granularity (compact tiers decode inside the 128-step
# scan), then final summary bench for the round record.
set -u
cd /root/repo
STATUS=logs/queue_r3.status
note() { echo "$(date +%H:%M:%S) [H] $*" >> "$STATUS"; }

WAIT_PID="${1:?usage: run_queue_r3h.sh <partG-pid>}"
note "part H waiting for part G pid $WAIT_PID"
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done

note "A/B: compact bench, dense decode"
python bench.py > logs/bench_compact_dense.log 2>&1
note "dense-decode bench rc=$? last=$(tail -1 logs/bench_compact_dense.log)"

note "A/B: compact bench, packed kernel"
DRUGLAMP_PACKED_GCN=1 python bench.py > logs/bench_compact_packed.log 2>&1
note "packed-kernel bench rc=$? last=$(tail -1 logs/bench_compact_packed.log)"

# In-dataset transfer: biosnap/cluster-trained models scored on the
# biosnap/random test split (5493 rows; random-split train CSV is a missing
# upstream blob, so eval-only is the strongest available protocol there).
for M in DrugLAMP DrugLAMP2C2P; do
  CKPT=$(ls -dt results/biosnap-cluster-${M}-seed42-*/ckpt_best 2>/dev/null | head -1)
  note "biosnap/random transfer ${M} using ckpt: $CKPT"
  python -m druglamp_tpu.cli.main --model ${M} --data biosnap --split random \
    --seed 42 --eval-only --gen-embed --ckpt "$CKPT" \
    > logs/biosnap_random_eval_${M}_r3.log 2>&1
  note "biosnap/random transfer ${M} done rc=$?"
done

note "=== part H complete ==="
