#!/bin/bash
# Scaling-evidence accumulator (the campaign behind BENCH/trials.jsonl).
#
# Fires one single-trial 8,32-vCPU scaling_bench pass whenever the 1-min
# load average is quiet (< 1.5), cycling three workloads so every
# work-dominated stage keeps gaining matched-window pairs:
#   0: dedup aux (SPARK_GRAFT_DEDUP_EXTRA=1.2M)
#   1: ann aux   (SPARK_GRAFT_ANN_N=1.5M)
#   2: base      (headline per-window pairs + default-knob stage rows)
#
# Each pass stamps one WINDOW_ID across its own ALU/stream controls and
# both trial levels, which is what makes the per-window matched-pair
# tables in BENCH/BASELINE.md possible.  Trials are append-only and
# keyed by workload knobs + WORKLOAD_VERSION, so the loop can run for
# days across plan changes without invalidating history.
#
# Usage: nohup tools/autopass.sh >/dev/null 2>&1 &
#        tail -f /tmp/autopass.log
# Do NOT run heavy foreground work while a pass is in flight (check
# `ps aux | grep scaling_bench`) — it pollutes that pass's window.
cd "$(dirname "$0")/.." || exit 1
i=0
while true; do
  load=$(cut -d' ' -f1 /proc/loadavg)
  ok=$(python3 -c "print(1 if $load < 1.5 else 0)")
  if [ "$ok" = "1" ]; then
    case $((i % 3)) in
      0) extra="SPARK_GRAFT_DEDUP_EXTRA=1200000" ;;
      1) extra="SPARK_GRAFT_ANN_N=1500000" ;;
      *) extra="" ;;
    esac
    echo "=== pass $i ($(date +%H:%M:%S)) load=$load $extra" >> /tmp/autopass.log
    env $extra SPARK_GRAFT_SCALING_LEVELS=8,32 SPARK_GRAFT_SCALING_TRIALS=1 \
      python tools/scaling_bench.py >> /tmp/autopass.log 2>&1
    i=$((i+1))
  else
    sleep 45
  fi
done
