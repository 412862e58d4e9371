#!/bin/bash
# Round-3 queue part J: complete the DrugLAMP human/cold 5-seed protocol
# (seeds 42 in part B, 40-41 in part G; 43-44 here), then a final summary.
set -u
cd /root/repo
STATUS=logs/queue_r3.status
note() { echo "$(date +%H:%M:%S) [J] $*" >> "$STATUS"; }

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

WAIT_PID="${1:?usage: run_queue_r3j.sh <partI-pid>}"
note "part J waiting for part I pid $WAIT_PID"
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done

for S in 43 44; do
  run_wd logs/druglamp_cold_s${S}_r3.log 2500 \
    python -m druglamp_tpu.cli.main --model DrugLAMP --data human --split cold --seed $S
  note "human/cold DrugLAMP seed $S done rc=$?"
done

note "=== part J complete ==="
