#!/bin/bash
# Round-5 CPU chain — runs the round's CPU-side evidence while the TPU
# tunnel is down (queue runner tools/tpu_queue_r5.sh owns the TPU side):
#
#   0. wait for the CPU warm start (PID in /tmp/warmstart.pid) to finish
#      and verify it saved results_r5_cpu/.../iter_0000.p
#   1. PPO-liveness A/B (VERDICT r4 #4): arms rl_on / rl_off from the SAME
#      post-NaN-fix warm start. Each arm runs in CHUNK-epoch resume slices
#      so a wall-budget kill still leaves checkpoints + per-epoch metrics
#      (save_model_interval is 50; a single long run killed mid-flight
#      would save nothing).  rl_on runs FIRST: it doubles as VERDICT #1's
#      reduced-scale CPU composite evidence.
#   2. tools/ppo_ab_report.py verdict -> docs/ppo_ab_r5.txt
#   3. held-out eval of the rl_on checkpoints -> docs/eval_ar_r5_cpu.txt
#
# Usage: tools/cpu_chain_r5.sh [target_epochs_per_arm]
#   CHAIN_ARM_BUDGET   wall seconds per arm (default 5400)
#   CHAIN_CHUNK        epochs per resume slice (default 6)
set -u
cd /root/repo
W=/tmp/cpu_chain_r5.log
TARGET=${1:-24}
CHUNK=${CHAIN_CHUNK:-6}
ARM_BUDGET=${CHAIN_ARM_BUDGET:-5400}
SRC=results_r5_cpu/statear/kin_poly/models/iter_0000.p
UHC=results/motion_im/uhc/models/iter_13000.p
BANK=data_bank/ar_train_56.pkl
TEST=data_bank/action_takes_test.pkl
N_ENVS=${AB_N_ENVS:-32}

echo "$(date +%T) cpu chain start (target=$TARGET chunk=$CHUNK budget=$ARM_BUDGET)" >> "$W"

# --- 0. wait for the warm start ---------------------------------------
WS_PID=$(cat /tmp/warmstart.pid 2>/dev/null || echo "")
while [ -n "$WS_PID" ] && kill -0 "$WS_PID" 2>/dev/null; do sleep 60; done
if [ ! -f "$SRC" ]; then
  echo "$(date +%T) FATAL: warm start left no checkpoint at $SRC" >> "$W"
  exit 1
fi
echo "$(date +%T) warm start done: $SRC" >> "$W"

latest_iter() {
  local l
  l=$(ls "$1"/iter_*.p 2>/dev/null \
      | sed 's/.*iter_0*\([0-9][0-9]*\)\.p/\1/' | sort -n | tail -1)
  echo "${l:-0}"
}

# --- 1. A/B arms in resume chunks --------------------------------------
for ARM in on off; do
  OUT=results_r5_cpu/ab_rl_${ARM}
  MODELS=$OUT/statear/kin_poly/models
  mkdir -p "$MODELS"
  [ -f "$MODELS/iter_0000.p" ] || cp "$SRC" "$MODELS/iter_0000.p"
  EXTRA=""
  [ "$ARM" = off ] && EXTRA="--no-rl-update"
  T0=$(date +%s)
  while :; do
    LAST=$(latest_iter "$MODELS")
    [ "$LAST" -ge "$TARGET" ] && break
    LEFT=$((ARM_BUDGET - ($(date +%s) - T0)))
    [ "$LEFT" -lt 300 ] && { echo "$(date +%T) arm $ARM budget out at epoch $LAST" >> "$W"; break; }
    NEXT=$((LAST + CHUNK)); [ "$NEXT" -gt "$TARGET" ] && NEXT=$TARGET
    echo "$(date +%T) arm $ARM: epochs $LAST -> $NEXT (left ${LEFT}s)" >> "$W"
    timeout "$LEFT" python scripts/train_ar_policy.py --cpu $EXTRA \
        --data "$BANK" --uhc-checkpoint "$UHC" \
        --iter "$LAST" --max-epochs "$NEXT" --n-envs "$N_ENVS" \
        --rollout-steps 100 --out "$OUT" \
        >> /tmp/ab_rl_${ARM}_r5.log 2>&1
    echo "$(date +%T) arm $ARM chunk rc=$?" >> "$W"
    NEW=$(latest_iter "$MODELS")
    [ "$NEW" -le "$LAST" ] && { echo "$(date +%T) arm $ARM stalled at $LAST — stopping arm" >> "$W"; break; }
  done
done

# --- 2. A/B report ------------------------------------------------------
python tools/ppo_ab_report.py \
    results_r5_cpu/ab_rl_on/statear/kin_poly/models/ar_kin_poly_metrics.jsonl \
    results_r5_cpu/ab_rl_off/statear/kin_poly/models/ar_kin_poly_metrics.jsonl 10 \
    > docs/ppo_ab_r5.txt 2>&1 \
  && echo "$(date +%T) A/B report -> docs/ppo_ab_r5.txt" >> "$W" \
  || echo "$(date +%T) A/B report FAILED" >> "$W"

# --- 3. held-out eval of rl_on checkpoints ------------------------------
ON_MODELS=results_r5_cpu/ab_rl_on/statear/kin_poly/models
ITERS=$(ls "$ON_MODELS"/iter_*.p 2>/dev/null \
        | sed 's/.*iter_0*\([0-9][0-9]*\)\.p/\1/' | sort -n | tr '\n' ' ')
if [ -n "$ITERS" ]; then
  echo "$(date +%T) eval sweep over iters: $ITERS" >> "$W"
  timeout 5400 python tools/eval_ar_sweep.py --cpu --data "$TEST" \
      --uhc-checkpoint "$UHC" --iters $ITERS \
      --out results_r5_cpu/ab_rl_on --fail-safe \
      > docs/eval_ar_r5_cpu.txt 2>&1 \
    && echo "$(date +%T) eval -> docs/eval_ar_r5_cpu.txt" >> "$W" \
    || echo "$(date +%T) eval FAILED" >> "$W"
fi
echo "$(date +%T) cpu chain done" >> "$W"
