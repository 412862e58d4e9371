#!/bin/bash
# Round-3 queue part R: opportunistic tail behind part Q.  Waits for the
# "part Q complete" status line, then uses the quiet chip for the compiled
# roofline audit (tools/roofline_audit.py — separates resource-bound from
# latency-bound on the measured step times).  Everything still respects the
# round-end quiet window for the driver's official bench.
set -u
cd /root/repo
STATUS=logs/queue_r3.status
ROUND_END=1787079000
DEADLINE_TS=$((ROUND_END - 1500))
KILL_TS=$((ROUND_END - 900))
note() { echo "$(date +%H:%M:%S) [R] $*" >> "$STATUS"; }
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

until grep -q "part Q complete" "$STATUS" 2>/dev/null; do
  sleep 60
  [ "$(date +%s)" -gt "$KILL_TS" ] && { note "Q never completed; R exits"; exit 0; }
done
note "=== part R starting; $(left)s to stage deadline ==="

if [ "$(left)" -gt 1200 ]; then
  run_wd logs/roofline_r3r.log 2500 python tools/roofline_audit.py
  note "roofline rc=$? ; $(left)s left"
  mkdir -p docs/artifacts && cp -f logs/roofline_r3r.log docs/artifacts/ 2>/dev/null
  git add docs/artifacts/roofline_r3r.log 2>/dev/null
  git commit -q -m "Roofline audit log (part R)

No-Verification-Needed: profiling artifact only" 2>/dev/null
fi

note "=== part R complete; chip free; $(left)s left ==="
