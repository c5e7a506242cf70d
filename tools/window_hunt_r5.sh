#!/bin/bash
# Round-5 measurement sequence: for EACH pending item, poll the host's
# pure-CPU ceiling and launch the item only in a healthy window (>= THRESH)
# — the bench-discipline rule that only ceiling-paired samples in healthy
# windows are admissible. Items run strictly sequentially (never co-run
# timed benches). Appends results to BENCH.md via each tool's own writer;
# the full log goes to LOG.
#
#   1. ScalingInterleaved MOR  16M x 4 batches x ROUNDS  (north rule)
#   2. ScalingInterleaved COW  16M x 4 batches x ROUNDS
#   3. BinlogBench 6M x 4 (sharded broker fleet, batched framing)
set -u
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
LOG=${LOG:-/tmp/window_hunt_r5.log}
THRESH=${THRESH:-0.78}
POLL_S=${POLL_S:-180}
ROUNDS=${ROUNDS:-2}
DEADLINE_S=${DEADLINE_S:-14400}
start=$(date +%s)

wait_healthy() {
  while true; do
    now=$(date +%s)
    if [ $((now - start)) -ge "$DEADLINE_S" ]; then
      echo "$(date -u +%H:%M:%S) deadline while waiting for $1" >> "$LOG"
      return 1
    fi
    probe=$(java -cp "$CP" graft.tools.HostProbe 2>/dev/null | tail -1)
    ceil=$(echo "$probe" | sed -n 's/.*"ceiling_4_16":\([0-9.]*\).*/\1/p')
    echo "$(date -u +%H:%M:%S) probe($1) $probe" >> "$LOG"
    if [ -n "$ceil" ] && awk -v c="$ceil" -v t="$THRESH" 'BEGIN{exit !(c>=t)}'; then
      echo "$(date -u +%H:%M:%S) HEALTHY ($ceil) -> $1" >> "$LOG"
      return 0
    fi
    sleep "$POLL_S"
  done
}

run() { # name, then the command
  name=$1; shift
  wait_healthy "$name" || return 1
  "$@" >> "$LOG" 2>&1
  echo "$(date -u +%H:%M:%S) DONE $name (exit $?)" >> "$LOG"
}

run scaling-mor  env SPARK_GRAFT_MOR=1 java $ADD_OPENS -Dspark.ui.enabled=false -Xmx96g -cp "$CP" \
  graft.tools.ScalingInterleaved 16000000 4 "$ROUNDS" BENCH.md
run scaling-cow  java $ADD_OPENS -Dspark.ui.enabled=false -Xmx96g -cp "$CP" \
  graft.tools.ScalingInterleaved 16000000 4 "$ROUNDS" BENCH.md
run binlog-6m    env SPARK_GRAFT_TRIALS=2 java $ADD_OPENS -Dspark.ui.enabled=false -Xmx32g -cp "$CP" \
  graft.tools.BinlogBench 6000000 4 BENCH.md
echo "$(date -u +%H:%M:%S) hunt complete" >> "$LOG"
