#!/bin/bash
# Round-4 TPU watcher: poll the tunneled backend and, the moment it comes
# back, run runbook item 1 (UHC get-up/step hardening on clips70) to
# iter 11000, resuming from the latest checkpoint after any crash/flap.
# ONE TPU job at a time — nothing else may use the tunnel while this runs.
cd /root/repo
W=/tmp/tpu_watch.log
echo "$(date +%T) watcher start" >> "$W"
while true; do
  LAST=$(ls results/motion_im/uhc/models/iter_*.p 2>/dev/null \
         | sed 's/.*iter_0*\([0-9]*\)\.p/\1/' | sort -n | tail -1)
  LAST=${LAST:-8000}
  if [ "$LAST" -ge 11000 ]; then
    echo "$(date +%T) UHC at iter $LAST — done" >> "$W"
    touch /tmp/UHC_R4_DONE
    break
  fi
  if bash tools/tpu_probe.sh 90 >> "$W" 2>&1; then
    echo "$(date +%T) TPU up — training from iter $LAST" >> "$W"
    touch /tmp/TPU_UP
    PYTHONPATH=/root/.axon_site timeout 10800 \
      python scripts/train_uhc.py --data data_bank/clips70.pkl \
        --iter "$LAST" --max-iters 11000 --n-envs 512 \
        >> /tmp/train_uhc_r4.log 2>&1
    echo "$(date +%T) training exited rc=$? (will re-probe)" >> "$W"
    sleep 30
  else
    sleep 480
  fi
done
