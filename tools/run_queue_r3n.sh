#!/bin/bash
# Round-3 queue part N: reprioritized tail of part M for the remaining
# wall-clock.  Part M's plan (10 more full trainings) cannot fit; VERDICT
# item 4 (biosnap/cluster 2C2P + the cross-dataset eval chain, which needs
# a fresh checkpoint) outranks extra cold seeds, and the chip must be FREE
# before round end so the driver's bench.py run is uncontended.
#
# Hard deadline: no new chip stage starts after DEADLINE_TS; any running
# stage is killed at KILL_TS.  Derived from PROGRESS.jsonl round clock
# (round start ~ts 1786995959, 43200 s round).
set -u
cd /root/repo
mkdir -p logs
STATUS=logs/queue_r3.status
ROUND_END=1787039159
DEADLINE_TS=$((ROUND_END - 1500))   # last stage may start before end-25min
KILL_TS=$((ROUND_END - 900))        # everything dead by end-15min
note() { echo "$(date +%H:%M:%S) [N] $*" >> "$STATUS"; }
left() { echo $((DEADLINE_TS - $(date +%s))); }

run_wd() {  # log stale_secs cmd... ; returns rc, enforces KILL_TS
  local log="$1" stale="$2"; shift 2
  "$@" >> "$log" 2>&1 &
  local pid=$!
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    local now=$(date +%s)
    local age=$(( now - $(stat -c %Y "$log" 2>/dev/null || echo "$now") ))
    if [ "$age" -gt "$stale" ] || [ "$now" -gt "$KILL_TS" ]; then
      note "KILL: $log (quiet ${age}s or past deadline) pid $pid"
      kill -TERM "$pid" 2>/dev/null; sleep 5; kill -KILL "$pid" 2>/dev/null
      break
    fi
  done
  wait "$pid" 2>/dev/null
}

note "=== part N starting; $(left)s to stage deadline ==="

# N0: adopt the in-flight cold DrugLAMP seed 43 (started by part M)
while kill -0 8689 2>/dev/null; do
  sleep 30
  [ "$(date +%s)" -gt "$KILL_TS" ] && { kill -TERM 8689; note "deadline kill s43"; break; }
done
note "cold DrugLAMP seed 43 finished (adopted); $(left)s left"

# N1: biosnap/cluster DrugLAMP2C2P seed 42 — the artifact-missing row in
# README's harder-splits table; also produces the checkpoint the eval
# chain needs (old ckpts wiped by the reset).
if [ "$(left)" -gt 2400 ]; then
  run_wd logs/biosnap_cluster_2c2p_r3n.log 2500 \
    python -m druglamp_tpu.cli.main --model DrugLAMP2C2P --data biosnap \
      --split cluster --seed 42 --gen-embed
  note "biosnap/cluster 2C2P rc=$? ; $(left)s left"
else
  note "SKIP biosnap 2C2P (insufficient time)"
fi

CKPT=$(ls -dt results/biosnap-cluster-DrugLAMP2C2P-seed42-*/ckpt_best 2>/dev/null | head -1)
note "eval-chain ckpt: ${CKPT:-none}"

# N2: bindingdb/cluster zero-shot eval (RS task, cross-dataset)
if [ -n "${CKPT:-}" ] && [ "$(left)" -gt 600 ]; then
  run_wd logs/bindingdb_cluster_eval_2c2p_r3n.log 2500 \
    python -m druglamp_tpu.cli.main --model DrugLAMP2C2P --data bindingdb \
      --split cluster --seed 42 --eval-only --gen-embed --ckpt "$CKPT"
  note "bindingdb/cluster zero-shot 2C2P rc=$? ; $(left)s left"
fi

# N3: biosnap/random in-dataset transfer eval (cache shared with cluster)
if [ -n "${CKPT:-}" ] && [ "$(left)" -gt 300 ]; then
  run_wd logs/biosnap_random_eval_2c2p_r3n.log 2500 \
    python -m druglamp_tpu.cli.main --model DrugLAMP2C2P --data biosnap \
      --split random --seed 42 --eval-only --ckpt "$CKPT"
  note "biosnap/random transfer 2C2P rc=$? ; $(left)s left"
fi

# N4: one clean bench for our own logs (driver runs the official one)
if [ "$(left)" -gt 0 ]; then
  run_wd logs/bench_r3n_final.log 2500 python bench.py
  note "part-N bench rc=$? last=$(tail -1 logs/bench_r3n_final.log 2>/dev/null)"
fi

note "=== part N complete; chip free ==="
