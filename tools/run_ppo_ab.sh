#!/bin/bash
# PPO-liveness A/B (VERDICT r3 #5): N epochs with the PPO half of the
# composite update on vs off, from the SAME warm-start checkpoint.
# Diagnostics (ratio_dev / ppo_grad_norm / adv_std) land in the metrics
# JSONL of each arm's model dir; summarize with tools/ppo_ab_report.py.
#
# Both arms start from the round-4 POST-NaN-fix warm start
# (results_r4/statear/kin_poly/models/iter_0000.p) — r3's iter_450 is stale
# for this comparison: its supervised phases ran with silently-zeroed NaN
# gradients (commit c5e5efd), so neither arm would be probing the real
# policy manifold.
#
# Usage: tools/run_ppo_ab.sh [epochs] [--cpu]
#   AB_N_ENVS=32 (default; 1-core CPU box) — raise to 128 on TPU
#   AB_SRC / AB_UHC / AB_OUT override the warm start / controller / out root
#   (round 5 defaults: the post-fix results_r5 warm start + hardened UHC)
# One TPU job at a time — arms run sequentially.
set -e
cd "$(dirname "$0")/.."
EPOCHS=${1:-50}
DEV=${2:-}
N_ENVS=${AB_N_ENVS:-32}
UHC=${AB_UHC:-results/motion_im/uhc/models/iter_11000.p}
BANK=${AB_BANK:-data_bank/ar_train_56.pkl}
SRC=${AB_SRC:-results_r5/statear/kin_poly/models/iter_0000.p}
OUTROOT=${AB_OUT:-results_r5}

for ARM in on off; do
  OUT=$OUTROOT/ab_rl_${ARM}
  mkdir -p "$OUT/statear/kin_poly/models"
  cp "$SRC" "$OUT/statear/kin_poly/models/iter_0000.p"
  EXTRA=""
  [ "$ARM" = off ] && EXTRA="--no-rl-update"
  echo "=== arm rl_update=$ARM -> $OUT ==="
  timeout 28800 python scripts/train_ar_policy.py $DEV $EXTRA \
    --data "$BANK" --uhc-checkpoint "$UHC" \
    --iter 0 --max-epochs "$EPOCHS" --n-envs "$N_ENVS" --rollout-steps 100 \
    --out "$OUT" 2>&1 | tee /tmp/ab_rl_${ARM}.log | grep -E "epoch|saved"
done
python tools/ppo_ab_report.py \
  "$OUTROOT"/ab_rl_on/statear/kin_poly/models/ar_kin_poly_metrics.jsonl \
  "$OUTROOT"/ab_rl_off/statear/kin_poly/models/ar_kin_poly_metrics.jsonl 10
