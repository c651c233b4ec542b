#!/bin/bash
# Wait for the tunnel watch sentinel, then run the full recovery sequence.
while [ ! -f /tmp/tpu_up ]; do sleep 60; done
echo "sentinel seen $(date)"
bash /root/repo/_tunnel_recovery.sh
echo "RECOVERY DONE $(date)"
