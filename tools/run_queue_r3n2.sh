#!/bin/bash
# Round-3 queue part N2 (replaces N while cold seed 43 runs): biosnap/cluster
# 2C2P at --max_epoch 60 instead of 100.  Seed 43 found a new best at epoch
# 49 and will run ~30 min longer than planned; a 100-epoch 2C2P would then
# face ~even odds of being deadline-killed — losing the checkpoint AND the
# eval chain.  60 epochs (early-stop patience scales to 15) completes
# worst-case ~25 min before the deadline; biosnap DrugLAMP's best was epoch
# 17 and every human/random 2C2P best was <=52, so the budget very likely
# contains the true best.  The deviation is footnoted in README (the
# reference's own kinase scripts override --max_epoch the same way).
set -u
cd /root/repo
STATUS=logs/queue_r3.status
ROUND_END=1787039159
DEADLINE_TS=$((ROUND_END - 1500))
KILL_TS=$((ROUND_END - 900))
note() { echo "$(date +%H:%M:%S) [N2] $*" >> "$STATUS"; }
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

note "=== part N2 starting; $(left)s to stage deadline ==="

while kill -0 8689 2>/dev/null; do
  sleep 30
  [ "$(date +%s)" -gt "$KILL_TS" ] && { kill -TERM 8689; note "deadline kill s43"; break; }
done
note "cold DrugLAMP seed 43 finished; $(left)s left"

if [ "$(left)" -gt 2100 ]; then
  run_wd logs/biosnap_cluster_2c2p_r3n.log 2500 \
    python -m druglamp_tpu.cli.main --model DrugLAMP2C2P --data biosnap \
      --split cluster --seed 42 --gen-embed --max_epoch 60
  note "biosnap/cluster 2C2P (max_epoch 60) rc=$? ; $(left)s left"
else
  note "SKIP biosnap 2C2P (insufficient time)"
fi

CKPT=$(ls -dt results/biosnap-cluster-DrugLAMP2C2P-seed42-*/ckpt_best 2>/dev/null | head -1)
note "eval-chain ckpt: ${CKPT:-none}"

if [ -n "${CKPT:-}" ] && [ "$(left)" -gt 600 ]; then
  run_wd logs/bindingdb_cluster_eval_2c2p_r3n.log 2500 \
    python -m druglamp_tpu.cli.main --model DrugLAMP2C2P --data bindingdb \
      --split cluster --seed 42 --eval-only --gen-embed --ckpt "$CKPT"
  note "bindingdb/cluster zero-shot 2C2P rc=$? ; $(left)s left"
fi

if [ -n "${CKPT:-}" ] && [ "$(left)" -gt 120 ]; then
  run_wd logs/biosnap_random_eval_2c2p_r3n.log 2500 \
    python -m druglamp_tpu.cli.main --model DrugLAMP2C2P --data biosnap \
      --split random --seed 42 --eval-only --ckpt "$CKPT"
  note "biosnap/random transfer 2C2P rc=$? ; $(left)s left"
fi

note "=== part N complete; chip free ==="
