#!/bin/bash
# Round-3 queue part Q: supersedes part P's tail after the on-chip device-
# data A/B landed (bench epoch_e2e_dd 870 vs epoch_e2e 387 pairs/s, 2.25x,
# logs/bench_packed_r3p.log).  The remaining NEW protocol tables (cold woLLM
# x5, cold 2C2P x5, biosnap woLLM/DrugLAMP/2C2P-100ep) run with
# --device-data on — each table internally consistent in one transport mode,
# and the chip covers ~2x more runs.  Cold DrugLAMP seed 44 (adopted from
# part P, $1 = its PID) stays host-pipeline for consistency with its
# seeds-40-43 table.  Results are committed as they land.
set -u
cd /root/repo
STATUS=logs/queue_r3.status
ADOPT_PID=${1:-0}
ROUND_END=1787079000          # 18:50 UTC — conservative vs ~19:06 true end
DEADLINE_TS=$((ROUND_END - 1500))
KILL_TS=$((ROUND_END - 900))  # chip must be quiet for the driver's bench.py
note() { echo "$(date +%H:%M:%S) [Q] $*" >> "$STATUS"; }
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
  run_wd "logs/${tag}_r3q.log" 2500 python -m druglamp_tpu.cli.main "$@"
  local rc=$?
  note "$tag rc=$rc ; $(left)s left"
  commit_results "Results: $tag (queue Q)"
  return $rc
}

note "=== part Q starting (device-data queue); $(left)s to stage deadline ==="

if [ "$ADOPT_PID" -gt 0 ]; then
  while kill -0 "$ADOPT_PID" 2>/dev/null; do
    sleep 30
    [ "$(date +%s)" -gt "$KILL_TS" ] && { kill -TERM "$ADOPT_PID"; note "deadline kill adopted s44"; break; }
  done
  note "adopted cold DrugLAMP s44 finished; $(left)s left"
  commit_results "Results: human/cold DrugLAMP seed 44 (completes the 5-seed cold table)"
fi

# Q1: cold woLLM x5 (reference scripts/human/cold/DrugLAMPwoLLM.sh)
for s in 40 41 42 43 44; do
  train cold_wollm_s$s 2400 --model DrugLAMPwoLLM --data human --split cold \
    --seed $s --device-data on
done

# Q2: cold 2C2P x5 (reference scripts/human/cold/DrugLAMP2C2P.sh)
for s in 40 41 42 43 44; do
  train cold_2c2p_s$s 2400 --model DrugLAMP2C2P --data human --split cold \
    --seed $s --device-data on
done

# Q3: biosnap/cluster woLLM (reference scripts/biosnap/cluster/DrugLAMPwoLLM.sh)
train biosnap_cluster_wollm_s42 2400 --model DrugLAMPwoLLM --data biosnap \
  --split cluster --seed 42 --device-data on

# Q4: biosnap/cluster DrugLAMP re-train (fresh checkpoint for its eval chain)
train biosnap_cluster_druglamp_s42 2400 --model DrugLAMP --data biosnap \
  --split cluster --seed 42 --device-data on
DCKPT=$(ls -dt results/biosnap-cluster-DrugLAMP-seed42-*/ckpt_best 2>/dev/null | head -1)

# Q5: eval chain behind the DrugLAMP checkpoint
if [ -n "${DCKPT:-}" ] && [ "$(left)" -gt 1500 ]; then
  run_wd logs/bindingdb_cluster_eval_dl_r3q.log 2500 \
    python -m druglamp_tpu.cli.main --model DrugLAMP --data bindingdb \
      --split cluster --seed 42 --eval-only --ckpt "$DCKPT"
  note "bindingdb/cluster zero-shot DrugLAMP rc=$? ; $(left)s left"
  commit_results "Results: bindingdb/cluster zero-shot eval of biosnap DrugLAMP"
  run_wd logs/biosnap_random_eval_dl_r3q.log 2500 \
    python -m druglamp_tpu.cli.main --model DrugLAMP --data biosnap \
      --split random --seed 42 --eval-only --ckpt "$DCKPT"
  note "biosnap/random transfer DrugLAMP rc=$? ; $(left)s left"
  commit_results "Results: biosnap/random transfer eval of biosnap DrugLAMP"
fi

# Q6: biosnap/cluster 2C2P at the full 100-epoch recipe (drops the budget
# footnote on the seed-42 row)
train biosnap_cluster_2c2p_100ep_s42 3000 --model DrugLAMP2C2P --data biosnap \
  --split cluster --seed 42 --device-data on

# Q7: perf artifacts
if [ "$(left)" -gt 1800 ]; then
  run_wd logs/step_profile_r3q.log 2500 python tools/step_profile.py
  note "step_profile rc=$? ; $(left)s left"
fi
if [ "$(left)" -gt 1800 ]; then
  run_wd logs/e2e_profile_r3q.log 2500 python tools/e2e_profile.py
  note "e2e_profile rc=$? ; $(left)s left"
fi

# Q8: one final clean bench (post device-data, warm caches)
if [ "$(left)" -gt 900 ]; then
  run_wd logs/bench_final_r3q.log 2500 python bench.py
  note "final bench rc=$? last=$(tail -1 logs/bench_final_r3q.log 2>/dev/null | head -c 300)"
  mkdir -p docs/artifacts && cp -f logs/bench_final_r3q.log docs/artifacts/ 2>/dev/null
  git add docs/artifacts/bench_final_r3q.log 2>/dev/null
  git commit -q -m "Final round-3 bench log (queue Q)

No-Verification-Needed: bench log artifact only" 2>/dev/null
fi

note "=== part Q complete; chip free; $(left)s left ==="
