#!/bin/bash
# Round-5 fallback orchestrator (builder session robustness).
#
# The round-4 builder session died mid-round on an API error and took its
# background chip jobs with it, losing the quality run.  This script runs
# fully detached (setsid) and guarantees the two driver deliverables land
# even if the interactive session dies again:
#   1. waits for the detached quality pipeline (QUALITY_r5b.json);
#   2. grace window: if the interactive session is alive it runs the
#      silicon A/Bs first and touches /tmp/orchestrate_go to release the
#      bench early; otherwise proceed after GRACE_S;
#   3. runs bench.py once on the real chip -> warms .jax_cache for the
#      driver's official end-of-round run and logs numbers.
set -u
cd /root/repo
QUALITY=QUALITY_r5b.json
GRACE_S=${GRACE_S:-1500}
DEADLINE=$(( $(date +%s) + 11000 ))

# 1. wait for the quality pipeline to finish (or its process to vanish)
while [ ! -f "$QUALITY" ] && [ "$(date +%s)" -lt "$DEADLINE" ]; do
    pgrep -f quality_run.py >/dev/null 2>&1 || break
    sleep 60
done
sleep 30  # let the writer finish

# 2. grace window for the interactive session's A/Bs
T_END=$(( $(date +%s) + GRACE_S ))
while [ ! -f /tmp/orchestrate_go ] && [ "$(date +%s)" -lt "$T_END" ]; do
    sleep 30
done

# 3. bench (idempotent: skip if an interactive bench already ran)
if [ ! -f /tmp/bench_r5_done ]; then
    timeout 2400 python bench.py > /tmp/bench_r5.log 2>&1
    echo "rc=$?" >> /tmp/bench_r5.log
    grep -o '{.*}' /tmp/bench_r5.log | tail -1 > BENCH_local_r5.json || true
    touch /tmp/bench_r5_done
fi
