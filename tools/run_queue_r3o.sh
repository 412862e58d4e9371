#!/bin/bash
# Round-3 queue part O: opportunistic tail behind part N.  Waits for the
# "part N complete" status line, then spends whatever wall-clock remains
# (same hard deadline) on: (1) the packed-GCN full-bench A/B — the
# missing evidence for flipping DRUGLAMP_PACKED_GCN on by default
# (VERDICT r2 item 10) — and (2) human/cold DrugLAMP seed 44 if enough
# time is left for a complete run (a deadline-killed training run is a
# wasted chip-hour, so the gate is conservative).
set -u
cd /root/repo
STATUS=logs/queue_r3.status
ROUND_END=1787039159
DEADLINE_TS=$((ROUND_END - 1500))
KILL_TS=$((ROUND_END - 900))
note() { echo "$(date +%H:%M:%S) [O] $*" >> "$STATUS"; }
left() { echo $((DEADLINE_TS - $(date +%s))); }

run_wd() {
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

until grep -q "part N complete" "$STATUS" 2>/dev/null; do
  sleep 30
  [ "$(date +%s)" -gt "$KILL_TS" ] && { note "N never completed; O exits"; exit 0; }
done
note "=== part O starting; $(left)s to stage deadline ==="

# O1: packed-GCN full bench (dense ran as N4 — this is the A/B pair)
if [ "$(left)" -gt 900 ]; then
  run_wd logs/bench_packed_r3o.log 2500 \
    env DRUGLAMP_PACKED_GCN=1 python bench.py
  note "packed bench rc=$? last=$(tail -1 logs/bench_packed_r3o.log 2>/dev/null)"
fi

# O2: human/cold DrugLAMP seed 44 — only with room for a COMPLETE run
# (warm XLA cache + warm embed cache: cold s43 ran ~25 min post-compile)
if [ "$(left)" -gt 2100 ]; then
  run_wd logs/druglamp_cold_s44_r3o.log 2500 \
    python -m druglamp_tpu.cli.main --model DrugLAMP --data human --split cold --seed 44
  note "cold DrugLAMP seed 44 rc=$? ; $(left)s left"
else
  note "SKIP cold seed 44 (insufficient time for a complete run)"
fi

note "=== part O complete; chip free ==="
