#!/bin/bash
# Round-5 TPU queue runner — drives the runbook stages in order, resuming
# from the latest checkpoint after any crash or tunnel flap. ONE TPU job at
# a time: this script must be the only tunnel user while it runs.
#
#   stage 1    UHC get-up/step hardening on clips70, iter -> 11000
#   stage 1.5  eval_uhc gate evidence (VERDICT #2) -> docs/eval_uhc_r5_*.txt
#   stage 2    AR composite retrain (kin_poly cfg, 56-take bank) with a
#              FRESH post-NaN-fix warm start, joint_controller on, out
#              results_r5; checkpoints every save_model_interval epochs
#
# --dry-run (VERDICT r4 #7): rehearse the ENTIRE chain on CPU at tiny scale
# into /tmp/queue_dry_r5 — 2-take banks, 2 iters/epochs — so a path/flag/OOM
# flaw surfaces in ~15 CPU-minutes instead of silently burning the TPU
# window. Commit the green log as docs/queue_dryrun_r5.txt.
set -u
cd /root/repo

DRY=0
[ "${1:-}" = "--dry-run" ] && DRY=1

if [ "$DRY" = 1 ]; then
  ROOT=/tmp/queue_dry_r5
  rm -rf "$ROOT"; mkdir -p "$ROOT"
  W="$ROOT/watch.log"
  UHC_OUT="$ROOT/uhc_out"
  AR_OUT="$ROOT/ar_out"
  UHC_TARGET=2
  DEV=--cpu
  UHC_ARGS="--n-envs 4 --rollout-steps 8"
  AR_ARGS="--init-steps 12 --full-steps 4 --n-envs 2 --rollout-steps 8 --max-epochs 2"
  EVAL_SEEDS=1
  T_TRAIN=1800; T_EVAL=1800
  # tiny banks: first 2 takes of the real ones (same loaders, same format)
  python - << 'EOF'
import joblib
for src, dst, n in [("data_bank/clips70.pkl", "/tmp/queue_dry_r5/clips2.pkl", 2),
                    ("data_bank/ar_train_56.pkl", "/tmp/queue_dry_r5/ar2.pkl", 2),
                    ("data_bank/action_takes_test.pkl", "/tmp/queue_dry_r5/test2.pkl", 2)]:
    bank = joblib.load(src)
    small = dict(list(bank.items())[:n])
    joblib.dump(small, dst)
    print(f"{dst}: {list(small)}")
EOF
  UHC_BANK=$ROOT/clips2.pkl
  AR_BANK=$ROOT/ar2.pkl
  TEST_BANK=$ROOT/test2.pkl
  EVAL_TXT="$ROOT/eval_uhc_dry.txt"
else
  ROOT=.
  W=/tmp/tpu_watch_r5.log
  UHC_OUT=results
  AR_OUT=results_r5
  UHC_TARGET=13000   # stage-1 result: 8000->11000 (clips70) + 11000->13000 (reactive_v=2 + supine hard-states)
  DEV=""
  UHC_ARGS="--n-envs 512"
  AR_ARGS="--init-steps 500 --full-steps 300 --n-envs 128 --rollout-steps 100"
  EVAL_SEEDS=3
  T_TRAIN=10800; T_EVAL=5400
  UHC_BANK=data_bank/clips70.pkl
  AR_BANK=data_bank/ar_train_56.pkl
  TEST_BANK=data_bank/action_takes_test.pkl
  EVAL_TXT="docs/eval_uhc_r5_iter${UHC_TARGET}.txt"
fi
UHC_MODELS=$UHC_OUT/motion_im/uhc/models
AR_MODELS=$AR_OUT/statear/kin_poly/models

echo "$(date +%T) queue runner start (dry=$DRY)" >> "$W"

latest_iter() {  # latest_iter <dir> <default>
  local l
  l=$(ls "$1"/iter_*.p 2>/dev/null \
      | sed 's/.*iter_0*\([0-9][0-9]*\)\.p/\1/' | sort -n | tail -1)
  echo "${l:-$2}"
}

probe_ok() {
  [ "$DRY" = 1 ] && return 0
  # 300s: a healthy-but-cold tunnel can take >90s to init (an on-chip
  # profile ran fine at 04:25 while the 90s probe was calling DOWN)
  bash tools/tpu_probe.sh 300 >> "$W" 2>&1
}

while [ ! -f /tmp/TPU_QUEUE_STOP ]; do
  if ! probe_ok; then sleep 480; continue; fi

  UHC_LAST=$(latest_iter "$UHC_MODELS" 0)
  if [ "$UHC_LAST" -lt "$UHC_TARGET" ]; then
    echo "$(date +%T) stage1: UHC from iter $UHC_LAST" >> "$W"
    timeout "$T_TRAIN" python scripts/train_uhc.py $DEV \
        --data "$UHC_BANK" --out "$UHC_OUT" \
        --iter "$UHC_LAST" --max-iters "$UHC_TARGET" $UHC_ARGS \
        >> "${TMPDIR:-/tmp}/train_uhc_r5.log" 2>&1
    echo "$(date +%T) stage1 exited rc=$?" >> "$W"
    sleep 5
    continue
  fi

  # stage 1.5: VERDICT-#2 gate evidence, once
  if [ ! -f "$EVAL_TXT" ]; then
    echo "$(date +%T) stage1.5: eval_uhc iter $UHC_TARGET" >> "$W"
    timeout "$T_EVAL" python scripts/eval_uhc.py $DEV \
        --iter "$UHC_TARGET" --data "$UHC_BANK" --out "$UHC_OUT" \
        --metrics --seeds "$EVAL_SEEDS" > "$EVAL_TXT" 2>&1 \
      || echo "$(date +%T) stage1.5 failed rc=$?" >> "$W"
  fi

  # stage 1.75: one-shot perf captures (VERDICT r4 #3 + #8) — bounded
  # timeouts, attempted once (marker file) so a crash can't starve stage 2.
  # ONE TPU job at a time: these run inside the queue, never alongside it.
  if [ "$DRY" = 0 ] && [ ! -f /tmp/perf_r5.done ]; then
    touch /tmp/perf_r5.done   # one attempt, even if a capture crashes
    echo "$(date +%T) stage1.75: perf captures" >> "$W"
    timeout 1800 env BENCH_ENV=ar BENCH_N_ENVS=1024 \
        python tools/profile_ar_substep.py \
        > docs/prof_ar1024_compact_r5.txt 2>&1
    echo "$(date +%T)   prof ar compact rc=$?" >> "$W"
    timeout 1800 env BENCH_ENV=ar BENCH_N_ENVS=1024 BENCH_NO_COMPACT=1 \
        python tools/profile_ar_substep.py \
        > docs/prof_ar1024_nocompact_r5.txt 2>&1
    echo "$(date +%T)   prof ar nocompact rc=$?" >> "$W"
    timeout 900 env BENCH_ENV=ar BENCH_AR_N_ENVS=1024 BENCH_NO_COMPACT=1 \
        python bench.py > docs/bench_ar_nocompact_r5.txt 2>&1
    echo "$(date +%T)   bench ar nocompact rc=$?" >> "$W"
    timeout 900 env B=2048 SOLVER_PALLAS=1 REPS=10 \
        python tools/bench_breakdown.py > docs/prof_uhc2048_r5.txt 2>&1
    echo "$(date +%T)   uhc 2048 rc=$?" >> "$W"
    timeout 900 env B=8192 SOLVER_PALLAS=1 REPS=10 \
        python tools/bench_breakdown.py > docs/prof_uhc8192_r5.txt 2>&1
    echo "$(date +%T)   uhc 8192 rc=$?" >> "$W"
  fi

  AR_LAST=$(latest_iter "$AR_MODELS" 0)
  if [ "$AR_LAST" -ge 20000 ] || { [ "$DRY" = 1 ] && [ "$AR_LAST" -ge 2 ]; }; then
    echo "$(date +%T) stage2 at epoch cap — queue done" >> "$W"
    break
  fi
  echo "$(date +%T) stage2: AR composite from epoch $AR_LAST" >> "$W"
  timeout "$T_TRAIN" python scripts/train_ar_policy.py $DEV --cfg kin_poly \
      --data "$AR_BANK" \
      --uhc-checkpoint "$UHC_MODELS/iter_$(printf %04d "$UHC_TARGET").p" \
      --iter "$AR_LAST" --joint-controller $AR_ARGS --out "$AR_OUT" \
      >> "${TMPDIR:-/tmp}/train_ar_r5.log" 2>&1
  echo "$(date +%T) stage2 exited rc=$?" >> "$W"
  sleep 5
done

if [ "$DRY" = 1 ]; then
  echo "=== dry-run artifact check ===" >> "$W"
  ok=1
  for f in "$UHC_MODELS/iter_0002.p" "$EVAL_TXT" "$AR_MODELS/iter_0000.p" \
           "$AR_MODELS/iter_0002.p" "$AR_MODELS/ar_kin_poly_metrics.jsonl"; do
    if [ -e "$f" ]; then echo "OK   $f" >> "$W"; else echo "MISS $f" >> "$W"; ok=0; fi
  done
  # the held-out sweep the round runs per checkpoint batch (CPU side)
  timeout "$T_EVAL" python tools/eval_ar_sweep.py --cpu \
      --data "$TEST_BANK" \
      --uhc-checkpoint "$UHC_MODELS/iter_0002.p" \
      --iters 2 --out "$AR_OUT" --fail-safe >> "$W" 2>&1 \
    && echo "OK   eval_ar_sweep" >> "$W" || { echo "MISS eval_ar_sweep" >> "$W"; ok=0; }
  [ "$ok" = 1 ] && echo "DRY RUN GREEN" >> "$W" || echo "DRY RUN FAILED" >> "$W"
  cat "$W"
fi
echo "$(date +%T) queue runner exit" >> "$W"
