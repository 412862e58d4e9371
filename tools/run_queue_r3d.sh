#!/bin/bash
# Round-3 queue part D: re-run the DrugLAMP seed 44 stage (its part-A slot
# crashed on the pre-fix packed-GCN kernel), then chip-validate the fixed
# kernel and record the step-profile delta with the kernel on vs off.
set -u
cd /root/repo
STATUS=logs/queue_r3.status
note() { echo "$(date +%H:%M:%S) [D] $*" >> "$STATUS"; }

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

WAIT_PID="${1:?usage: run_queue_r3d.sh <partC-pid>}"
note "part D waiting for part C pid $WAIT_PID"
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
note "part D starting"

run_wd logs/druglamp_s44_r3d.log 1500 \
  python -m druglamp_tpu.cli.main --model DrugLAMP --data human --split random --seed 44
note "DrugLAMP seed 44 done rc=$?"

run_wd logs/gcn_kernel_bench_r3.log 1500 \
  env PYTHONPATH=/root/repo:/root/.axon_site python tools/gcn_kernel_bench.py
note "gcn kernel chip validation rc=$?"

run_wd logs/step_profile_packed_r3.log 1500 \
  env PYTHONPATH=/root/repo:/root/.axon_site DRUGLAMP_PACKED_GCN=1 \
  python tools/step_profile.py
note "step_profile (packed gcn ON) rc=$?"

note "=== part D complete ==="
