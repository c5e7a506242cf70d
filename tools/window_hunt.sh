#!/bin/bash
# Poll the host's pure-CPU ceiling every POLL_S seconds; when a window reads
# >= THRESH, immediately run the 16M-event N/4N CDC scaling protocol in that
# window. Appends every probe and every scaling result to LOG. Stops after
# MAX_RUNS scaling runs or DEADLINE_S seconds.
set -u
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
LOG=${LOG:-/tmp/window_hunt.log}
# 0.78 not 0.80: the probe mirrors ScalingBench's in-run estimator but still
# reads slightly below it (cold-process JIT/placement); the recorded sample's
# validity is decided by the IN-RUN ceiling anyway, so a marginal trigger
# only costs one bounded run.
THRESH=${THRESH:-0.78}
POLL_S=${POLL_S:-240}
MAX_RUNS=${MAX_RUNS:-3}
DEADLINE_S=${DEADLINE_S:-18000}
runs=0
start=$(date +%s)
while true; do
  now=$(date +%s)
  [ $((now - start)) -ge "$DEADLINE_S" ] && { echo "$(date -u +%H:%M:%S) deadline" >> "$LOG"; break; }
  probe=$(java -cp "$CP" graft.tools.HostProbe 2>/dev/null | tail -1)
  ceil=$(echo "$probe" | sed -n 's/.*"ceiling_4_16":\([0-9.]*\).*/\1/p')
  echo "$(date -u +%H:%M:%S) probe $probe" >> "$LOG"
  if [ -n "$ceil" ] && awk -v c="$ceil" -v t="$THRESH" 'BEGIN{exit !(c>=t)}'; then
    echo "$(date -u +%H:%M:%S) HEALTHY window (ceiling $ceil) -> scaling run" >> "$LOG"
    SPARK_GRAFT_TRIALS=2 java -Xmx96g -cp "$CP" graft.tools.ScalingBench \
      16000000 4 /tmp/scaling_hunt.md >> "$LOG" 2>&1
    runs=$((runs + 1))
    [ "$runs" -ge "$MAX_RUNS" ] && { echo "$(date -u +%H:%M:%S) max runs" >> "$LOG"; break; }
  fi
  sleep "$POLL_S"
done
