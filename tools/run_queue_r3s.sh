#!/bin/bash
# Round-3 queue part S: the session was extended again (~12 h from 13:34 UTC,
# so ROUND_END moves from 18:50 to ~01:34 Aug 19; we use 01:15 conservative).
# Waits for parts Q (pid $1) and R (pid $2) to exit, then completes the LAST
# reference sweep matrix the shipped data allows: biosnap/cluster seeds
# 40/41/43/44 for all three variants (reference scripts/biosnap/cluster/*.sh
# run seeds 40-44; seed 42 is already artifact-backed), followed by per-seed
# transfer-eval chains and a clean final bench.  Results commit as they land
# (workspace resets wipe untracked files).
set -u
cd /root/repo
STATUS=logs/queue_r3.status
Q_PID=${1:-0}
R_PID=${2:-0}
ROUND_END=1787102100          # 01:15 UTC Aug 19 — conservative vs ~01:34 true end
DEADLINE_TS=$((ROUND_END - 1500))
KILL_TS=$((ROUND_END - 1200)) # chip quiet for the driver's official bench.py
note() { echo "$(date +%H:%M:%S) [S] $*" >> "$STATUS"; }
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

commit_results() {
  for i in 1 2 3; do
    git add -f results/*/metrics.jsonl 2>/dev/null
    if git diff --cached --quiet; then return 0; fi
    git commit -q -m "$1

No-Verification-Needed: results artifact only" && return 0
    sleep 5
  done
  note "WARN: commit failed: $1"
}

train() {  # train <tag> <min-seconds> <extra args...>
  local tag="$1" need="$2"; shift 2
  if [ "$(left)" -lt "$need" ]; then note "SKIP $tag (insufficient time)"; return 1; fi
  run_wd "logs/${tag}_r3s.log" 2500 python -m druglamp_tpu.cli.main "$@"
  local rc=$?
  note "$tag rc=$rc ; $(left)s left"
  commit_results "Results: $tag (queue S)"
  return $rc
}

evalrun() {  # evalrun <tag> <ckpt> <data> <split>
  local tag="$1" ckpt="$2" data="$3" split="$4" model="$5"
  [ -z "$ckpt" ] && { note "SKIP $tag (no ckpt)"; return 1; }
  [ "$(left)" -lt 900 ] && { note "SKIP $tag (insufficient time)"; return 1; }
  run_wd "logs/${tag}_r3s.log" 2500 python -m druglamp_tpu.cli.main \
    --model "$model" --data "$data" --split "$split" --seed 42 \
    --eval-only --ckpt "$ckpt"
  note "$tag rc=$? ; $(left)s left"
  commit_results "Results: $tag (queue S)"
}

# Wait for parts Q and R to finish (by PID — never pattern-match processes)
for pid in "$Q_PID" "$R_PID"; do
  [ "$pid" -gt 0 ] || continue
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    [ "$(date +%s)" -gt "$KILL_TS" ] && { note "predecessor $pid still alive past KILL_TS; S exits"; exit 0; }
  done
done
note "=== part S starting (extended round, end 01:15 UTC); $(left)s to stage deadline ==="

# S1: biosnap/cluster DrugLAMP2C2P seeds 40/41/43/44 (full 100-epoch recipe;
# seed 42 at 100 ep comes from part Q's Q6 stage)
for s in 40 41 43 44; do
  train biosnap_cluster_2c2p_s$s 1800 --model DrugLAMP2C2P --data biosnap \
    --split cluster --seed $s --device-data on
done

# S2: biosnap/cluster DrugLAMP seeds 40/41/43/44
for s in 40 41 43 44; do
  train biosnap_cluster_druglamp_s$s 1500 --model DrugLAMP --data biosnap \
    --split cluster --seed $s --device-data on
done

# S3: biosnap/cluster DrugLAMPwoLLM seeds 40/41/43/44
for s in 40 41 43 44; do
  train biosnap_cluster_wollm_s$s 1200 --model DrugLAMPwoLLM --data biosnap \
    --split cluster --seed $s --device-data on
done

# S4: per-seed transfer-eval chains for the 2C2P checkpoints (mean±std
# transfer tables instead of single-seed rows)
for s in 40 41 43 44; do
  CKPT=$(ls -dt results/biosnap-cluster-DrugLAMP2C2P-seed$s-*/ckpt_best 2>/dev/null | head -1)
  evalrun bindingdb_cluster_eval_2c2p_s$s "$CKPT" bindingdb cluster DrugLAMP2C2P
  evalrun biosnap_random_eval_2c2p_s$s "$CKPT" biosnap random DrugLAMP2C2P
done

# S5: one clean bench on the quiet chip
if [ "$(left)" -gt 900 ]; then
  run_wd logs/bench_final_r3s.log 2500 python bench.py
  note "final bench rc=$? last=$(tail -1 logs/bench_final_r3s.log 2>/dev/null | head -c 300)"
  mkdir -p docs/artifacts && cp -f logs/bench_final_r3s.log docs/artifacts/ 2>/dev/null
  git add docs/artifacts/bench_final_r3s.log 2>/dev/null
  git commit -q -m "Final part-S bench log

No-Verification-Needed: bench log artifact only" 2>/dev/null
fi

note "=== part S complete; chip free; $(left)s left ==="
