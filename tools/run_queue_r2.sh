#!/bin/bash
# Round-2 run queue: executes after the in-flight woLLM sweep finishes.
# Sequential (single TPU chip). Each stage logs to logs/ and appends a line
# to logs/queue_r2.status so progress is observable.
set -u
cd /root/repo
STATUS=logs/queue_r2.status
note() { echo "$(date +%H:%M:%S) $*" >> "$STATUS"; }

WOLLM_PID="${1:-}"
if [ -n "$WOLLM_PID" ]; then
  note "waiting for woLLM sweep pid $WOLLM_PID"
  while kill -0 "$WOLLM_PID" 2>/dev/null; do sleep 30; done
fi
note "woLLM sweep done"

# 1) full DrugLAMP on human/random, 5 seeds, full recipe, in-process
#    (shared jit caches save ~8 min/seed of TPU program loads); --gen-embed
#    populates the shared cache on the first seed, later seeds skip
python -m druglamp_tpu.cli.sweep --model DrugLAMP --data human --split random \
  --seeds 40 41 42 43 44 --in-process --max-retries 3 \
  --out results/sweep_human_random_DrugLAMP_r2.json \
  -- --gen-embed > logs/sweep_druglamp_r2.log 2>&1
note "DrugLAMP sweep rc=$?"

# 2) full DrugLAMP2C2P on human/random, 5 seeds (reuses the embed cache)
python -m druglamp_tpu.cli.sweep --model DrugLAMP2C2P --data human --split random \
  --seeds 40 41 42 43 44 --in-process --max-retries 3 \
  --out results/sweep_human_random_2C2P_r2.json \
  > logs/sweep_2c2p_r2.log 2>&1
note "2C2P sweep rc=$?"

# 2b) woLLM seed 42 re-run (round-1 artifact was wiped with the workspace;
#     regenerate so all 5 full-recipe woLLM runs have artifacts this round)
python -m druglamp_tpu.cli.main --model DrugLAMPwoLLM --data human --split random \
  --seed 42 > logs/wollm_s42_r2.log 2>&1
note "woLLM seed 42 rerun rc=$?"

# 3) RS-task mode on the shipped-complete cluster data (reference
#    main.py:67-68,81-83): biosnap/cluster, both LLM models.
#    No --work-dir → both share results/embed_cache/biosnap (gen once).
python -m druglamp_tpu.cli.main --model DrugLAMP --data biosnap --split cluster \
  --seed 42 --gen-embed > logs/biosnap_cluster_druglamp.log 2>&1
note "biosnap/cluster DrugLAMP rc=$?"
python -m druglamp_tpu.cli.main --model DrugLAMP2C2P --data biosnap --split cluster \
  --seed 42 > logs/biosnap_cluster_2c2p.log 2>&1
note "biosnap/cluster 2C2P rc=$?"

# 4) bindingdb/cluster zero-shot eval pass with the biosnap-trained 2C2P
#    (generate_embeddings seeds the random-init encoders identically, so the
#    cross-dataset embeddings are consistent with training)
CKPT=$(ls -dt results/biosnap-cluster-DrugLAMP2C2P-seed42-*/ckpt_best 2>/dev/null | head -1)
note "bindingdb eval using ckpt: $CKPT"
python -m druglamp_tpu.cli.main --model DrugLAMP2C2P --data bindingdb --split cluster \
  --seed 42 --eval-only --gen-embed --ckpt "$CKPT" \
  > logs/bindingdb_cluster_eval.log 2>&1
note "bindingdb/cluster eval rc=$?"

# 5) bench + profiling on the now-free chip
python bench.py > logs/bench_r2.log 2>&1
note "bench rc=$? $(tail -1 logs/bench_r2.log)"
PYTHONPATH=/root/repo:/root/.axon_site python tools/step_profile.py \
  > logs/step_profile_r2.log 2>&1
note "step_profile rc=$?"
note "queue complete"
