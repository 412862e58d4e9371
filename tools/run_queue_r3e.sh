#!/bin/bash
# Round-3 queue part E: re-run the bindingdb/cluster zero-shot evals.  Their
# part-A slots crashed in orbax restore on a relative --ckpt path (fixed in
# trainer.restore/_save with abspath); embeddings are already cached so these
# are quick.
set -u
cd /root/repo
STATUS=logs/queue_r3.status
note() { echo "$(date +%H:%M:%S) [E] $*" >> "$STATUS"; }

run_wd() {
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

WAIT_PID="${1:?usage: run_queue_r3e.sh <partD-pid>}"
note "part E waiting for part D pid $WAIT_PID"
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
note "part E starting"

for M in DrugLAMP DrugLAMP2C2P; do
  CKPT=$(ls -dt results/biosnap-cluster-${M}-seed42-*/ckpt_best 2>/dev/null | head -1)
  note "bindingdb zero-shot ${M} using ckpt: $CKPT"
  run_wd logs/bindingdb_cluster_eval_${M}_r3e.log 2500 \
    python -m druglamp_tpu.cli.main --model ${M} --data bindingdb --split cluster \
      --seed 42 --eval-only --gen-embed --ckpt "$CKPT"
  note "bindingdb/cluster zero-shot ${M} done rc=$?"
done

note "=== part E complete ==="
