#!/bin/bash
# Round-4 TPU queue runner: polls the tunneled backend and drives the
# runbook's TPU stages in order, resuming from the latest checkpoint after
# any crash or tunnel flap. ONE TPU job at a time — this script must be the
# only tunnel user while it runs.
#
#   stage 1  UHC get-up/step hardening on clips70, iter -> 11000
#   stage 2  AR composite retrain (kin_poly cfg) on the 56-take bank with a
#            FRESH warm start (the NaN-gradient fix in core/tmath.py makes
#            pre-fix checkpoints stale: their supervised training was
#            silently zeroed after the first few steps), joint_controller on
#
# Stage 2 runs until /tmp/TPU_QUEUE_STOP exists or the epoch cap; the AR
# agent checkpoints every save_model_interval epochs, so progress survives.
cd /root/repo
W=/tmp/tpu_watch.log
AR_OUT=results_r4
AR_MODELS=$AR_OUT/statear/kin_poly/models
echo "$(date +%T) queue runner start" >> "$W"

latest_iter() {  # latest_iter <dir> <default>
  local l
  l=$(ls "$1"/iter_*.p 2>/dev/null \
      | sed 's/.*iter_0*\([0-9][0-9]*\)\.p/\1/' | sort -n | tail -1)
  echo "${l:-$2}"
}

probe_ok() { bash tools/tpu_probe.sh 90 >> "$W" 2>&1; }

while [ ! -f /tmp/TPU_QUEUE_STOP ]; do
  if ! probe_ok; then sleep 480; continue; fi
  touch /tmp/TPU_UP

  UHC_LAST=$(latest_iter results/motion_im/uhc/models 8000)
  if [ "$UHC_LAST" -lt 11000 ]; then
    echo "$(date +%T) stage1: UHC from iter $UHC_LAST" >> "$W"
    PYTHONPATH=/root/.axon_site timeout 10800 \
      python scripts/train_uhc.py --data data_bank/clips70.pkl \
        --iter "$UHC_LAST" --max-iters 11000 --n-envs 512 \
        >> /tmp/train_uhc_r4.log 2>&1
    echo "$(date +%T) stage1 exited rc=$?" >> "$W"
    sleep 20
    continue
  fi
  touch /tmp/UHC_R4_DONE

  # stage 1.5: capture the VERDICT-#2 gate evidence once (TPU eval of the
  # hardened checkpoint on clips70: getup/step tracked + coverage_det)
  if [ ! -f docs/eval_uhc_r4_iter11000.txt ]; then
    echo "$(date +%T) stage1.5: eval_uhc iter 11000 on clips70" >> "$W"
    PYTHONPATH=/root/.axon_site timeout 5400 \
      python scripts/eval_uhc.py --iter 11000 --data data_bank/clips70.pkl \
        --metrics --seeds 3 > docs/eval_uhc_r4_iter11000.txt 2>&1 \
      || echo "$(date +%T) stage1.5 failed rc=$?" >> "$W"
  fi

  AR_LAST=$(latest_iter "$AR_MODELS" 0)
  if [ "$AR_LAST" -ge 20000 ]; then
    echo "$(date +%T) stage2 at epoch cap — queue done" >> "$W"
    touch /tmp/AR_R4_DONE
    break
  fi
  echo "$(date +%T) stage2: AR composite from epoch $AR_LAST" >> "$W"
  PYTHONPATH=/root/.axon_site timeout 10800 \
    python scripts/train_ar_policy.py --cfg kin_poly \
      --data data_bank/ar_train_56.pkl \
      --uhc-checkpoint results/motion_im/uhc/models/iter_11000.p \
      --iter "$AR_LAST" --joint-controller \
      --init-steps 500 --full-steps 300 \
      --n-envs 128 --rollout-steps 100 --out "$AR_OUT" \
      >> /tmp/train_ar_r4.log 2>&1
  echo "$(date +%T) stage2 exited rc=$?" >> "$W"
  sleep 20
done
echo "$(date +%T) queue runner exit" >> "$W"
