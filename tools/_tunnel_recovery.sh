#!/bin/bash
# Run the full on-chip validation + measurement sequence after tunnel
# recovery, in priority order, one TPU process at a time, all output logged.
# Usage: bash _tunnel_recovery.sh [phase...]   (default: all phases)
# Phases: validate tpu_tests bench knn_ab emd_ab flagship
set -u
cd /root/repo
LOG=/tmp/recovery
mkdir -p $LOG
phases="${*:-validate tpu_tests bench entry knn_ab emd_ab flagship}"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a $LOG/summary.txt
  timeout "$to" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  tail -25 "$LOG/$name.log" | tee -a $LOG/summary.txt
  echo "--- $name rc=$rc ---" | tee -a $LOG/summary.txt
}

for p in $phases; do
  case $p in
    validate)
      run validate 900 python _onchip_validate.py ;;
    tpu_tests)
      run tpu_tests 2400 env PCCF_TEST_TPU=1 python -m pytest tests/test_kernels_tpu.py -q ;;
    bench)
      run bench 1800 python bench.py ;;
    entry)
      run entry 900 python __graft_entry__.py ;;
    knn_ab)
      for g in 1 2 4; do
        run knn_g$g 600 env PCCF_KNN_GROUP=$g python _knn_pool_probe.py
      done
      for u in 4 8; do
        run pool_u$u 600 env PCCF_POOL_UNROLL=$u python _knn_pool_probe.py
      done
      run knn_bf16 600 env PCCF_KNN_MXU=bf16 python _knn_pool_probe.py ;;
    emd_ab)
      run emd_ab 900 python _emd_probe.py bench ;;
    flagship)
      run flagship 2400 python _flagship_proof.py ;;
  esac
done
echo "RECOVERY SEQUENCE DONE $(date)" | tee -a $LOG/summary.txt
# durable copy for the session to fold into BASELINE.md (untracked)
cp $LOG/summary.txt /root/repo/_recovery_summary.txt 2>/dev/null || true
