#!/bin/bash
# Diagnostic: one warmed, profiled CDC replay at a given thread count.
# Usage: profile_replay.sh <cores> [outdir]
# Emits [progress] micro-batch JSON + [stage] lines to stderr (captured
# in $out/prof<cores>.log) and the __REPLAY_RESULT line on stdout.
set -e
cores=${1:?cores}
out=${2:-/dev/shm/profrun}
mkdir -p "$out"
cp=$(ls /opt/spark/jars/*.jar | tr '\n' ':')/root/repo/target/scala-2.13/classes
log=/dev/shm/graft-benchlog-40000000-s42-rg16
warm=/dev/shm/graft-benchlog-warm12m-s42-rg16
opens="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
rm -rf "$out/work$cores"
SPARK_GRAFT_STAGE_PROFILE=1 \
java $opens -Xmx20g -XX:MaxHeapFreeRatio=100 -XX:ParallelGCThreads=$((cores>4?cores:4)) \
  -Dspark.ui.enabled=false -cp "$cp" graft.Bench __replay "$cores" \
  "$log" "$out/work$cores" "$warm" 2> "$out/prof$cores.log"
