#!/bin/bash
# Round-3 queue part M: second workspace reset recovery.  The reset wiped
# logs/, embedding caches, checkpoints, the XLA compile cache, and every
# in-flight run.  Git-tracked results/*/metrics.jsonl survived.  This queue
# (a) finishes every protocol run whose README/STATUS row is currently
# artifact-unbacked, (b) re-runs the eval chain that needs fresh
# checkpoints, and (c) retakes the perf artifacts.  Order: bench-affecting
# work first, then rows already claimed in README, then new coverage.
set -u
cd /root/repo
mkdir -p logs
STATUS=logs/queue_r3.status
note() { echo "$(date +%H:%M:%S) [M] $*" >> "$STATUS"; }

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

note "=== part M (post-reset recovery) starting ==="

# M0: human/random embedding cache (bench epoch_e2e tier + DrugLAMP runs)
run_wd logs/gen_embed_human_random_r3m.log 2500 \
  python -m druglamp_tpu.cli.main --model DrugLAMP --data human --split random \
    --seed 40 --gen-embed-only
note "human/random cache regen rc=$?"

# M1: packed-GCN kernel chip validation (gates default-on for the bench)
run_wd logs/gcn_kernel_bench_r3m.log 2500 \
  env PYTHONPATH=/root/repo:/root/.axon_site python tools/gcn_kernel_bench.py
note "gcn kernel bench rc=$?"

# M2: human/random DrugLAMP seed 44 — the one artifact-unbacked row in the
# 15-run protocol table (prior runs died at epochs 35 and 14 in resets)
run_wd logs/druglamp_rand_s44_r3m.log 2500 \
  python -m druglamp_tpu.cli.main --model DrugLAMP --data human --split random --seed 44
note "human/random DrugLAMP seed 44 rc=$?"

# M3: human/cold DrugLAMP seeds 42-44 (40,41 done pre-reset; cold cache wiped)
run_wd logs/druglamp_cold_s42_r3m.log 2500 \
  python -m druglamp_tpu.cli.main --model DrugLAMP --data human --split cold \
    --seed 42 --gen-embed
note "cold DrugLAMP seed 42 rc=$?"
for S in 43 44; do
  run_wd logs/druglamp_cold_s${S}_r3m.log 2500 \
    python -m druglamp_tpu.cli.main --model DrugLAMP --data human --split cold --seed $S
  note "cold DrugLAMP seed $S rc=$?"
done

# M4: biosnap/cluster all three models (seed 42) + the eval chain that needs
# their fresh checkpoints (old ckpts wiped).  README already cites the
# DrugLAMP + 2C2P rows — re-backing them is also a determinism check.
run_wd logs/biosnap_cluster_druglamp_r3m.log 2500 \
  python -m druglamp_tpu.cli.main --model DrugLAMP --data biosnap --split cluster \
    --seed 42 --gen-embed
note "biosnap/cluster DrugLAMP rc=$?"
run_wd logs/biosnap_cluster_2c2p_r3m.log 2500 \
  python -m druglamp_tpu.cli.main --model DrugLAMP2C2P --data biosnap --split cluster --seed 42
note "biosnap/cluster 2C2P rc=$?"
run_wd logs/biosnap_cluster_wollm_r3m.log 2500 \
  python -m druglamp_tpu.cli.main --model DrugLAMPwoLLM --data biosnap --split cluster --seed 42
note "biosnap/cluster woLLM rc=$?"

for M in DrugLAMP DrugLAMP2C2P; do
  CKPT=$(ls -dt results/biosnap-cluster-${M}-seed42-*/ckpt_best 2>/dev/null | head -1)
  note "bindingdb/cluster zero-shot ${M} ckpt: $CKPT"
  run_wd logs/bindingdb_cluster_eval_${M}_r3m.log 2500 \
    python -m druglamp_tpu.cli.main --model ${M} --data bindingdb --split cluster \
      --seed 42 --eval-only --gen-embed --ckpt "$CKPT"
  note "bindingdb/cluster zero-shot ${M} rc=$?"
done
for M in DrugLAMP DrugLAMP2C2P; do
  CKPT=$(ls -dt results/biosnap-cluster-${M}-seed42-*/ckpt_best 2>/dev/null | head -1)
  run_wd logs/biosnap_random_eval_${M}_r3m.log 2500 \
    python -m druglamp_tpu.cli.main --model ${M} --data biosnap --split random \
      --seed 42 --eval-only --gen-embed --ckpt "$CKPT"
  note "biosnap/random transfer ${M} rc=$?"
done

# M5: human/cold woLLM, 5 seeds (no caches needed)
for S in 40 41 42 43 44; do
  run_wd logs/wollm_cold_s${S}_r3m.log 2500 \
    python -m druglamp_tpu.cli.main --model DrugLAMPwoLLM --data human --split cold --seed $S
  note "cold woLLM seed $S rc=$?"
done

# M6: human/cold DrugLAMP2C2P, 5 seeds (completes the cold 3-model matrix)
for S in 40 41 42 43 44; do
  run_wd logs/2c2p_cold_s${S}_r3m.log 2500 \
    python -m druglamp_tpu.cli.main --model DrugLAMP2C2P --data human --split cold --seed $S
  note "cold 2C2P seed $S rc=$?"
done

# M7: perf artifacts — step profile, packed-GCN A/B bench, throughput sweep,
# e2e gap attribution
run_wd logs/step_profile_r3m.log 1500 \
  env PYTHONPATH=/root/repo:/root/.axon_site python tools/step_profile.py
note "step profile rc=$?"
run_wd logs/bench_dense_r3m.log 2500 python bench.py
note "A/B dense bench rc=$? last=$(tail -1 logs/bench_dense_r3m.log)"
run_wd logs/bench_packed_r3m.log 2500 env DRUGLAMP_PACKED_GCN=1 python bench.py
note "A/B packed bench rc=$? last=$(tail -1 logs/bench_packed_r3m.log)"
run_wd logs/throughput_sweep_r3m.log 2000 \
  env PYTHONPATH=/root/repo:/root/.axon_site python tools/throughput_sweep.py
note "throughput sweep rc=$? tail=$(tail -1 logs/throughput_sweep_r3m.log)"
run_wd logs/e2e_profile_r3m.log 2000 \
  env PYTHONPATH=/root/repo:/root/.axon_site python tools/e2e_profile.py
note "e2e profile rc=$? tail=$(tail -1 logs/e2e_profile_r3m.log)"

# M8: final clean bench for the round record
run_wd logs/bench_r3m_final.log 2500 python bench.py
note "final bench rc=$? last=$(tail -1 logs/bench_r3m_final.log)"

note "=== part M complete ==="
