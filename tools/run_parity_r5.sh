#!/bin/bash
# VERDICT r4 #5: scaled two-framework parity — SSL+CM gates exercised with
# the reference's epoch gating (EPOCH_STEP=5, INIT_EPOCH=5 incl. the
# power-of-10 calibration epoch), both gradient modes, human/cold split.
# Sequential: the box has one core and each run is ~1.5-2 h.
set -u
cd /root/repo
common=(env JAX_PLATFORMS=cpu TFT_DATA=human TFT_SPLIT=cold
        TFT_TRAIN_ROWS=512 TFT_EVAL_ROWS=512 TFT_EPOCHS=10 TFT_BS=8
        TFT_GATES=ssl_cm TFT_EPOCH_STEP=5 TFT_INIT_EPOCH=5)
"${common[@]}" TFT_GRAD_MODE=per_loss \
    python -u tools/two_framework_train.py \
    > docs/artifacts/two_framework_train_sslcm_perloss_r5.log 2>&1
echo "== per_loss rc=$? =="
"${common[@]}" TFT_GRAD_MODE=legacy_aliased \
    python -u tools/two_framework_train.py \
    > docs/artifacts/two_framework_train_sslcm_aliased_r5.log 2>&1
echo "== legacy_aliased rc=$? =="
