#!/bin/bash
# PPO-liveness A/B (VERDICT r3 #5): N epochs from iter_450 with the PPO half
# of the composite update on vs off. Diagnostics (ratio_dev / ppo_grad_norm /
# adv_std) land in the metrics JSONL of each arm's model dir.
#
# Usage: tools/run_ppo_ab.sh [epochs] [--cpu]
# One TPU job at a time — arms run sequentially.
set -e
cd "$(dirname "$0")/.."
EPOCHS=${1:-200}
DEV=${2:-}
UHC=results/motion_im/uhc/models/iter_8000.p
BANK=data_bank/action_takes_48.pkl
BASE=450
END=$((BASE + EPOCHS))

for ARM in on off; do
  OUT=results_r4/ab_rl_${ARM}
  mkdir -p "$OUT/statear/kin_poly/models"
  cp results/statear/kin_poly/models/iter_0450.p \
     "$OUT/statear/kin_poly/models/iter_0450.p"
  EXTRA=""
  [ "$ARM" = off ] && EXTRA="--no-rl-update"
  echo "=== arm rl_update=$ARM -> $OUT ==="
  timeout 14000 python scripts/train_ar_policy.py $DEV $EXTRA \
    --data "$BANK" --uhc-checkpoint "$UHC" \
    --iter $BASE --max-epochs $END --n-envs 64 --rollout-steps 100 \
    --out "$OUT" 2>&1 | tee /tmp/ab_rl_${ARM}.log | grep -E "epoch|saved"
done
echo "A/B done: compare results_r4/ab_rl_{on,off}/statear/kin_poly/*.jsonl"
