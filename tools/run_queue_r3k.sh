#!/bin/bash
# Round-3 queue part K: recover every experiment whose artifacts were lost
# in the mid-round workspace reset (logs/ + untracked results dirs wiped;
# only git-tracked metrics.jsonl survived), then extend protocol coverage to
# the full reference script matrix the shipped data allows
# (reference scripts/: human/cold × 3 models, biosnap/cluster × 3 models).
# Re-runs are deterministic (fixed PRNG keys, same code) so each should
# reproduce the README numbers, doubling as a determinism check.
set -u
cd /root/repo
mkdir -p logs
STATUS=logs/queue_r3.status
note() { echo "$(date +%H:%M:%S) [K] $*" >> "$STATUS"; }

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

note "=== part K (artifact recovery + protocol completion) starting ==="

# K0: rebuild the human-random embedding cache (wiped in the reset); the
# bench's epoch_e2e tier reads it (bench.py CACHE_ROOT) and the round-end
# driver bench must see epoch_e2e_input="cache+store"
run_wd logs/gen_embed_human_random_r3k.log 2500 \
  python -m druglamp_tpu.cli.main --model DrugLAMP --data human --split random \
    --seed 40 --gen-embed-only
note "human-random cache regen done rc=$?"

# K1: packed-GCN kernel chip validation (part G gate: fast, unlocks the
# default-on decision early)
run_wd logs/gcn_kernel_bench_r3k.log 1500 \
  env PYTHONPATH=/root/repo:/root/.axon_site python tools/gcn_kernel_bench.py
note "gcn kernel bench done rc=$?"

# K2: human/cold DrugLAMP, 5 seeds; first run rebuilds the human-cold cache
# (backs the Part J cold 5-seed protocol claim)
run_wd logs/druglamp_cold_s40_r3k.log 2500 \
  python -m druglamp_tpu.cli.main --model DrugLAMP --data human --split cold \
    --seed 40 --gen-embed
note "cold DrugLAMP seed 40 done rc=$?"
for S in 41 42 43 44; do
  run_wd logs/druglamp_cold_s${S}_r3k.log 2500 \
    python -m druglamp_tpu.cli.main --model DrugLAMP --data human --split cold --seed $S
  note "cold DrugLAMP seed $S done rc=$?"
done

# K3: biosnap/cluster RS-task, all three models (reference
# scripts/biosnap/cluster/*.sh; train target_train, val=test=target_test)
run_wd logs/biosnap_cluster_druglamp_r3k.log 2500 \
  python -m druglamp_tpu.cli.main --model DrugLAMP --data biosnap --split cluster \
    --seed 42 --gen-embed
note "biosnap/cluster DrugLAMP done rc=$?"
run_wd logs/biosnap_cluster_2c2p_r3k.log 2500 \
  python -m druglamp_tpu.cli.main --model DrugLAMP2C2P --data biosnap --split cluster --seed 42
note "biosnap/cluster 2C2P done rc=$?"
run_wd logs/biosnap_cluster_wollm_r3k.log 2500 \
  python -m druglamp_tpu.cli.main --model DrugLAMPwoLLM --data biosnap --split cluster --seed 42
note "biosnap/cluster woLLM done rc=$?"

# K4: bindingdb/cluster zero-shot (eval-only) with the K3 checkpoints
for M in DrugLAMP DrugLAMP2C2P; do
  CKPT=$(ls -dt results/biosnap-cluster-${M}-seed42-*/ckpt_best 2>/dev/null | head -1)
  note "bindingdb/cluster zero-shot ${M} using ckpt: $CKPT"
  run_wd logs/bindingdb_cluster_eval_${M}_r3k.log 2500 \
    python -m druglamp_tpu.cli.main --model ${M} --data bindingdb --split cluster \
      --seed 42 --eval-only --gen-embed --ckpt "$CKPT"
  note "bindingdb/cluster zero-shot ${M} done rc=$?"
done

# K5: biosnap/random in-dataset transfer (part H protocol)
for M in DrugLAMP DrugLAMP2C2P; do
  CKPT=$(ls -dt results/biosnap-cluster-${M}-seed42-*/ckpt_best 2>/dev/null | head -1)
  note "biosnap/random transfer ${M} using ckpt: $CKPT"
  run_wd logs/biosnap_random_eval_${M}_r3k.log 2500 \
    python -m druglamp_tpu.cli.main --model ${M} --data biosnap --split random \
      --seed 42 --eval-only --gen-embed --ckpt "$CKPT"
  note "biosnap/random transfer ${M} done rc=$?"
done

# K6: human/cold woLLM, 5 seeds (no caches needed)
for S in 40 41 42 43 44; do
  run_wd logs/wollm_cold_s${S}_r3k.log 2500 \
    python -m druglamp_tpu.cli.main --model DrugLAMPwoLLM --data human --split cold --seed $S
  note "cold woLLM seed $S done rc=$?"
done

# K7: step profile for the kernel-headroom record
run_wd logs/step_profile_r3k.log 1500 \
  env PYTHONPATH=/root/repo:/root/.axon_site python tools/step_profile.py
note "step profile done rc=$?"

# K8: packed-GCN A/B at official bench granularity (part H protocol)
run_wd logs/bench_dense_r3k.log 2000 python bench.py
note "A/B dense bench rc=$? last=$(tail -1 logs/bench_dense_r3k.log)"
run_wd logs/bench_packed_r3k.log 2000 \
  env DRUGLAMP_PACKED_GCN=1 python bench.py
note "A/B packed bench rc=$? last=$(tail -1 logs/bench_packed_r3k.log)"

# K9: human/cold DrugLAMP2C2P, 5 seeds (reference scripts/human/cold/
# DrugLAMP2C2P.sh — completes the 3-model × 5-seed cold matrix)
for S in 40 41 42 43 44; do
  run_wd logs/2c2p_cold_s${S}_r3k.log 2500 \
    python -m druglamp_tpu.cli.main --model DrugLAMP2C2P --data human --split cold --seed $S
  note "cold 2C2P seed $S done rc=$?"
done

# K10: batch-size throughput sweep (part I protocol)
run_wd logs/throughput_sweep_r3k.log 2000 \
  env PYTHONPATH=/root/repo:/root/.axon_site python tools/throughput_sweep.py
note "throughput sweep rc=$? tail=$(tail -1 logs/throughput_sweep_r3k.log)"

note "=== part K complete ==="
