#!/bin/bash
# Probe the axon tunnel every 10 min; on success write sentinel and exit.
rm -f /tmp/tpu_up
while true; do
  timeout 300 python /root/repo/tools/_tpucheck.py > /tmp/tpucheck.log 2>&1
  if grep -q "matmul:" /tmp/tpucheck.log; then
    date > /tmp/tpu_up
    echo "TUNNEL UP $(date)"
    exit 0
  fi
  echo "still down $(date)"
  sleep 600
done
