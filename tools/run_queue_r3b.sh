#!/bin/bash
# Round-3 queue part B: waits for part A (pid $1), then runs human/cold
# experiments (the r1 cold-split artifact was wiped with the workspace) and
# a fast-suite pytest duration survey for test tiering.
set -u
cd /root/repo
STATUS=logs/queue_r3.status
note() { echo "$(date +%H:%M:%S) [B] $*" >> "$STATUS"; }

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

WAIT_PID="${1:?usage: run_queue_r3b.sh <partA-pid>}"
note "part B waiting for part A pid $WAIT_PID"
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
note "part A done; part B starting"

run_wd logs/wollm_cold_r3.log 1500 \
  python -m druglamp_tpu.cli.main --model DrugLAMPwoLLM --data human --split cold --seed 42
note "human/cold woLLM done rc=$?"

run_wd logs/druglamp_cold_r3.log 2500 \
  python -m druglamp_tpu.cli.main --model DrugLAMP --data human --split cold --seed 42 --gen-embed
note "human/cold DrugLAMP done rc=$?"

note "=== part B complete ==="
