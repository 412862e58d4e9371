#!/bin/bash
# Round-3 queue part P: the round was EXTENDED (~12 h from 07:06 UTC), so the
# deadline-guarded N2/O tail was superseded.  This queue spends the extension
# on the former "round-4 priorities" (docs/STATUS.md): finish the eval chain
# behind the fresh biosnap/cluster 2C2P checkpoint, the packed-GCN bench A/B,
# the full cold matrices (DrugLAMP s44, woLLM x5, 2C2P x5), biosnap/cluster
# woLLM + DrugLAMP re-train + its eval chain, a 100-epoch 2C2P re-run, and
# perf artifacts.  Every completed run's metrics.jsonl is committed
# immediately (workspace resets wipe untracked files).
set -u
cd /root/repo
STATUS=logs/queue_r3.status
ROUND_END=1787079000          # 18:50 UTC — conservative vs ~19:06 true end
DEADLINE_TS=$((ROUND_END - 1500))
KILL_TS=$((ROUND_END - 900))  # chip must be quiet for the driver's bench.py
note() { echo "$(date +%H:%M:%S) [P] $*" >> "$STATUS"; }
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

commit_results() {  # $1 = commit message
  for i in 1 2 3; do
    git add -f results/*/metrics.jsonl 2>/dev/null
    if git diff --cached --quiet; then return 0; fi
    git commit -q -m "$1

No-Verification-Needed: results artifact only" && return 0
    sleep 5
  done
  note "WARN: commit failed: $1"
}

train() {  # train <tag> <extra args...>
  local tag="$1"; shift
  if [ "$(left)" -lt 2400 ]; then note "SKIP $tag (insufficient time)"; return 1; fi
  run_wd "logs/${tag}_r3p.log" 2500 python -m druglamp_tpu.cli.main "$@"
  local rc=$?
  note "$tag rc=$rc ; $(left)s left"
  commit_results "Results: $tag (queue P)"
  return $rc
}

note "=== part P starting (extended round); $(left)s to stage deadline ==="

CKPT=$(ls -dt results/biosnap-cluster-DrugLAMP2C2P-seed42-*/ckpt_best 2>/dev/null | head -1)
note "2C2P eval-chain ckpt: ${CKPT:-none}"

# P1-P2: eval chain behind the fresh 2C2P checkpoint (VERDICT r2 item 4)
if [ -n "${CKPT:-}" ] && [ "$(left)" -gt 1800 ]; then
  run_wd logs/bindingdb_cluster_eval_2c2p_r3p.log 2500 \
    python -m druglamp_tpu.cli.main --model DrugLAMP2C2P --data bindingdb \
      --split cluster --seed 42 --eval-only --gen-embed --ckpt "$CKPT"
  note "bindingdb/cluster zero-shot 2C2P rc=$? ; $(left)s left"
  commit_results "Results: bindingdb/cluster zero-shot eval of biosnap 2C2P"
  run_wd logs/biosnap_random_eval_2c2p_r3p.log 2500 \
    python -m druglamp_tpu.cli.main --model DrugLAMP2C2P --data biosnap \
      --split random --seed 42 --eval-only --gen-embed --ckpt "$CKPT"
  note "biosnap/random transfer 2C2P rc=$? ; $(left)s left"
  commit_results "Results: biosnap/random transfer eval of biosnap 2C2P"
fi

# P3-P4: packed-GCN bench A/B (VERDICT r2 item 10 evidence)
if [ "$(left)" -gt 3000 ]; then
  run_wd logs/bench_dense_r3p.log 2500 python bench.py
  note "dense bench rc=$? last=$(tail -1 logs/bench_dense_r3p.log 2>/dev/null | head -c 300)"
  run_wd logs/bench_packed_r3p.log 2500 env DRUGLAMP_PACKED_GCN=1 python bench.py
  note "packed bench rc=$? last=$(tail -1 logs/bench_packed_r3p.log 2>/dev/null | head -c 300)"
  mkdir -p docs/artifacts
  cp -f logs/bench_dense_r3p.log logs/bench_packed_r3p.log docs/artifacts/ 2>/dev/null
  git add docs/artifacts/bench_dense_r3p.log docs/artifacts/bench_packed_r3p.log 2>/dev/null
  git commit -q -m "Packed-GCN bench A/B logs (part P)

No-Verification-Needed: bench log artifacts only" 2>/dev/null
fi

# P5: complete the cold DrugLAMP matrix (seed 44)
train cold_druglamp_s44 --model DrugLAMP --data human --split cold --seed 44

# P6-P10: cold woLLM x5 (reference scripts/human/cold/DrugLAMPwoLLM.sh)
for s in 40 41 42 43 44; do
  train cold_wollm_s$s --model DrugLAMPwoLLM --data human --split cold --seed $s
done

# P11-P15: cold 2C2P x5 (reference scripts/human/cold/DrugLAMP2C2P.sh)
for s in 40 41 42 43 44; do
  train cold_2c2p_s$s --model DrugLAMP2C2P --data human --split cold --seed $s
done

# P16: biosnap/cluster woLLM (reference scripts/biosnap/cluster/DrugLAMPwoLLM.sh)
train biosnap_cluster_wollm_s42 --model DrugLAMPwoLLM --data biosnap --split cluster --seed 42

# P17: biosnap/cluster DrugLAMP re-train (checkpoint for its eval chain; cache warm)
train biosnap_cluster_druglamp_s42 --model DrugLAMP --data biosnap --split cluster --seed 42
DCKPT=$(ls -dt results/biosnap-cluster-DrugLAMP-seed42-*/ckpt_best 2>/dev/null | head -1)

# P18-P19: eval chain behind the DrugLAMP checkpoint
if [ -n "${DCKPT:-}" ] && [ "$(left)" -gt 1500 ]; then
  run_wd logs/bindingdb_cluster_eval_dl_r3p.log 2500 \
    python -m druglamp_tpu.cli.main --model DrugLAMP --data bindingdb \
      --split cluster --seed 42 --eval-only --ckpt "$DCKPT"
  note "bindingdb/cluster zero-shot DrugLAMP rc=$? ; $(left)s left"
  commit_results "Results: bindingdb/cluster zero-shot eval of biosnap DrugLAMP"
  run_wd logs/biosnap_random_eval_dl_r3p.log 2500 \
    python -m druglamp_tpu.cli.main --model DrugLAMP --data biosnap \
      --split random --seed 42 --eval-only --ckpt "$DCKPT"
  note "biosnap/random transfer DrugLAMP rc=$? ; $(left)s left"
  commit_results "Results: biosnap/random transfer eval of biosnap DrugLAMP"
fi

# P20: biosnap/cluster 2C2P at the full 100-epoch recipe (drops the budget footnote)
train biosnap_cluster_2c2p_100ep_s42 --model DrugLAMP2C2P --data biosnap --split cluster --seed 42

# P21: perf artifacts
if [ "$(left)" -gt 1800 ]; then
  run_wd logs/step_profile_r3p.log 2500 python tools/step_profile.py
  note "step_profile rc=$? ; $(left)s left"
fi
if [ "$(left)" -gt 1800 ]; then
  run_wd logs/e2e_profile_r3p.log 2500 python tools/e2e_profile.py
  note "e2e_profile rc=$? ; $(left)s left"
fi

note "=== part P complete; chip free; $(left)s left ==="
