#!/bin/bash
# Round-3 queue: bench first (the round-2 official perf artifact was a crash
# — VERDICT r2 #1), then the three missing 5-seed-protocol runs, then the
# RS-task cluster experiments with preserved artifacts, then profiling.
# Every stage runs under a log-mtime stall watchdog (tunneled-TPU RPCs
# occasionally wedge; a fresh process reconnects fine).
set -u
cd /root/repo
STATUS=logs/queue_r3.status
mkdir -p logs
note() { echo "$(date +%H:%M:%S) $*" >> "$STATUS"; }

run_wd() {  # run_wd <logfile> <stale-seconds> <cmd...>
  local log="$1" stale="$2"; shift 2
  local attempt rc
  for attempt in 1 2; do
    "$@" >> "$log" 2>&1 &
    local pid=$!
    while kill -0 "$pid" 2>/dev/null; do
      sleep 60
      local age=$(( $(date +%s) - $(stat -c %Y "$log" 2>/dev/null || date +%s) ))
      if [ "$age" -gt "$stale" ]; then
        note "WATCHDOG: $log quiet ${age}s — killing pid $pid (attempt $attempt)"
        kill -TERM "$pid" 2>/dev/null; sleep 5; kill -KILL "$pid" 2>/dev/null
        break
      fi
    done
    wait "$pid"; rc=$?
    [ "$rc" -eq 0 ] && return 0
    note "stage rc=$rc (attempt $attempt): $*"
  done
  return 1
}

# Wait for the leftover round-2 in-process sweep (pid in WAIT_PID) to finish
# its last seed — it is completing 2C2P seed 44 and shares the chip.
WAIT_PID=7373
if kill -0 "$WAIT_PID" 2>/dev/null; then
  note "waiting for leftover r2 sweep pid $WAIT_PID (2C2P seed 44)"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  note "leftover r2 sweep exited"
fi

note "=== round-3 queue starting ==="

# 1. Bench — the official perf artifact; must complete rc=0 on the chip.
run_wd logs/bench_r3.log 1500 python bench.py
note "bench rc=$? last=$(tail -1 logs/bench_r3.log)"

# 2-4. Complete the 5-seed protocol (reference scripts/human/random/*.sh).
run_wd logs/wollm_s42_r3.log 1500 \
  python -m druglamp_tpu.cli.main --model DrugLAMPwoLLM --data human --split random --seed 42
note "woLLM seed 42 done rc=$?"

run_wd logs/druglamp_s44_r3.log 1500 \
  python -m druglamp_tpu.cli.main --model DrugLAMP --data human --split random --seed 44
note "DrugLAMP seed 44 done rc=$?"

# (2C2P seed 44 was completed by the leftover round-2 sweep process.)

# 5-6. RS-task cluster experiments (reference main.py:67-68,81-83):
# biosnap/cluster trains on target_train (source_train absent upstream),
# val=test=target_test; first run generates the biosnap embedding caches.
run_wd logs/biosnap_cluster_druglamp_r3.log 2500 \
  python -m druglamp_tpu.cli.main --model DrugLAMP --data biosnap --split cluster \
    --seed 42 --gen-embed
note "biosnap/cluster DrugLAMP done rc=$?"

run_wd logs/biosnap_cluster_2c2p_r3.log 1500 \
  python -m druglamp_tpu.cli.main --model DrugLAMP2C2P --data biosnap --split cluster --seed 42
note "biosnap/cluster 2C2P done rc=$?"

# 7. Cross-dataset zero-shot: biosnap/cluster-trained models scored on
# bindingdb/cluster target_test (which ships with no train data).
for M in DrugLAMP DrugLAMP2C2P; do
  CKPT=$(ls -dt results/biosnap-cluster-${M}-seed42-*/ckpt_best 2>/dev/null | head -1)
  note "bindingdb zero-shot ${M} using ckpt: $CKPT"
  run_wd logs/bindingdb_cluster_eval_${M}_r3.log 2500 \
    python -m druglamp_tpu.cli.main --model ${M} --data bindingdb --split cluster \
      --seed 42 --eval-only --gen-embed --ckpt "$CKPT"
  note "bindingdb/cluster zero-shot ${M} done rc=$?"
done

# 8. Host-RSS leak probe (r2 rc=137 root cause: OOM kills at ~130 GB RSS).
run_wd logs/leak_probe_r3.log 1500 \
  python tools/leak_probe.py --model DrugLAMPwoLLM --epochs 40 --cutoff 1024
note "leak probe done rc=$?"

# 9. Step profile for the kernel-headroom work (VERDICT r2 #10).
run_wd logs/step_profile_r3.log 1500 \
  env PYTHONPATH=/root/repo:/root/.axon_site python tools/step_profile.py
note "step_profile done rc=$?"

note "=== round-3 queue complete ==="
