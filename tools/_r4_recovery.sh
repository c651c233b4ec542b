#!/bin/bash
# Round-4 chip-work chain: wait for the tunnel sentinel (/tmp/tpu_up, written
# by _tunnel_watch.sh), then run the queued silicon work in priority order,
# one TPU process at a time, everything logged under /tmp/r4/.
# Usage: bash tools/_r4_recovery.sh [phase...]
# Phases: quality probes bench
set -u
cd /root/repo
LOG=/tmp/r4
mkdir -p $LOG
phases="${*:-quality probes bench}"

while [ ! -f /tmp/tpu_up ]; do sleep 30; done
echo "tunnel up, starting phases: $phases" | tee -a $LOG/summary.txt

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a $LOG/summary.txt
  timeout "$to" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  tail -15 "$LOG/$name.log" | tee -a $LOG/summary.txt
  echo "--- $name rc=$rc ---" | tee -a $LOG/summary.txt
}

for p in $phases; do
  case $p in
    quality)  # the VERDICT r3 #4 deliverable: full 4-stage pipeline + eval
      run quality 7200 python tools/quality_run.py ;;
    probes)   # fast attribution probes: fused-CVAE A/B + dispatch overhead
      run cvae_ab 900 python tools/_cvae_ab.py
      run emd_race 900 python tools/_emd_probe.py bench ;;
    bench)    # best-observed round-4 numbers for BASELINE.md
      run bench 3600 python bench.py ;;
  esac
done
echo "ALL DONE $(date)" | tee -a $LOG/summary.txt
