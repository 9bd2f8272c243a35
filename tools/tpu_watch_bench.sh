#!/bin/bash
# Round-5 continuation watcher: poll the tunneled TPU and, on recovery,
# capture the contact-plan perf evidence in strict sequence (ONE tunnel
# user at a time):
#   1. UHC bench @2048 (plan on)               -> docs/bench_uhc_plan_r5.txt
#   2. AR bench @1024 re-capture, tunnel clean -> docs/bench_ar_plan_r5.txt
#      (the 52.8k first capture shared the tunnel with a stray diag proc)
#   3. AR bench @1024 with plan OFF (A/B)      -> docs/bench_ar_noplan_r5.txt
#   4. fixed hoist-proof AR stage profile      -> docs/prof_ar1024_plan_r5.txt
# Exits when all four artifacts exist.
set -u
cd /root/repo
W=/tmp/tpu_watch_bench.log
echo "$(date +%T) bench watcher start" >> "$W"

run_one() {  # $1 = artifact path, $2... = command
  local out="$1"; shift
  [ -s "$out" ] && return 0
  echo "$(date +%T) running: $* -> $out" >> "$W"
  timeout 2400 "$@" > "$out.tmp" 2>&1
  local rc=$?
  if [ $rc -eq 0 ] && ! grep -q "TPU backend unavailable\|tunnel wedged" "$out.tmp"; then
    mv "$out.tmp" "$out"
    echo "$(date +%T) OK $out" >> "$W"
    return 0
  fi
  echo "$(date +%T) FAILED rc=$rc $out (keeping .tmp)" >> "$W"
  return 1
}

while true; do
  if [ -s docs/bench_uhc_plan_r5.txt ] && [ -s docs/bench_ar_plan_r5.txt ] \
     && [ -s docs/bench_ar_noplan_r5.txt ] && [ -s docs/prof_ar1024_plan_r5.txt ]; then
    echo "$(date +%T) all captures done" >> "$W"
    touch /tmp/BENCH_R5_DONE
    break
  fi
  if bash tools/tpu_probe.sh 90 >> "$W" 2>&1; then
    run_one docs/bench_uhc_plan_r5.txt \
      env BENCH_N_ENVS=2048 python bench.py || { sleep 60; continue; }
    run_one docs/bench_ar_plan_r5.txt \
      env BENCH_ENV=ar BENCH_AR_N_ENVS=1024 python bench.py || { sleep 60; continue; }
    run_one docs/bench_ar_noplan_r5.txt \
      env BENCH_ENV=ar BENCH_AR_N_ENVS=1024 BENCH_NO_PLAN=1 python bench.py || { sleep 60; continue; }
    run_one docs/prof_ar1024_plan_r5.txt \
      env BENCH_N_ENVS=1024 python tools/profile_ar_substep.py || { sleep 60; continue; }
  else
    sleep 420
  fi
done
