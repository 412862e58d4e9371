#!/bin/bash
# Round-2 queue, part 3: waits for the in-flight 2C2P sweep (pid $1), then
# runs the remaining stages under the stall watchdog (see run_queue_r2c.sh).
set -u
cd /root/repo
STATUS=logs/queue_r2.status
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

WAIT_PID=""
if [ -n "$WAIT_PID" ]; then
  note "part4 waiting for 2C2P sweep pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
note "2C2P sweep finished"

run_wd logs/sweep_2c2p_r2.log 1500 \
  python -m druglamp_tpu.cli.sweep --model DrugLAMP2C2P --data human --split random \
    --seeds 43 44 --in-process --max-retries 2 \
    --out results/sweep_human_random_2C2P_r2b.json
note "2C2P seeds 43-44 done"

run_wd logs/druglamp_s44.log 1500 \
  python -m druglamp_tpu.cli.main --model DrugLAMP --data human --split random --seed 44
note "DrugLAMP seed 44 done"

run_wd logs/wollm_s42_r2.log 1500 \
  python -m druglamp_tpu.cli.main --model DrugLAMPwoLLM --data human --split random --seed 42
note "woLLM seed 42 rerun done"

run_wd logs/biosnap_cluster_druglamp.log 1500 \
  python -m druglamp_tpu.cli.main --model DrugLAMP --data biosnap --split cluster \
    --seed 42 --gen-embed
note "biosnap/cluster DrugLAMP done"
run_wd logs/biosnap_cluster_2c2p.log 1500 \
  python -m druglamp_tpu.cli.main --model DrugLAMP2C2P --data biosnap --split cluster --seed 42
note "biosnap/cluster 2C2P done"

CKPT=$(ls -dt results/biosnap-cluster-DrugLAMP2C2P-seed42-*/ckpt_best 2>/dev/null | head -1)
note "bindingdb eval using ckpt: $CKPT"
run_wd logs/bindingdb_cluster_eval.log 1500 \
  python -m druglamp_tpu.cli.main --model DrugLAMP2C2P --data bindingdb --split cluster \
    --seed 42 --eval-only --gen-embed --ckpt "$CKPT"
note "bindingdb/cluster eval done"

run_wd logs/bench_r2.log 1500 python bench.py
note "bench rc=$? $(tail -1 logs/bench_r2.log)"
run_wd logs/step_profile_r2.log 1500 \
  env PYTHONPATH=/root/repo:/root/.axon_site python tools/step_profile.py
note "step_profile done"
note "queue part 4 complete"
