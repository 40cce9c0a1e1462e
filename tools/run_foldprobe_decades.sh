#!/usr/bin/env bash
# Round-16 FOLDPROBE refresh: re-price the SHIPPED chained segmented probe
# (r15 verdict items 1/6/7) with per-leg minima across TWO fresh JVMs per
# decade. Each JVM writes one row; tools/merge_foldprobe.py folds the rows
# into FOLDPROBE.json.
#
# Usage: tools/run_foldprobe_decades.sh [outdir]
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/foldprobe_r16}
mkdir -p "$OUT"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
# the forked-run JVM flags from build.sbt (Spark-on-JDK17 module opens +
# the bench heap), so a raw `java` launch behaves like `sbt runMain`
JOPTS="-Xmx${SPARK_DRIVER_MEM:-32g} -XX:ReservedCodeCacheSize=512m \
 -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  JOPTS="$JOPTS --add-opens java.base/$p=ALL-UNNAMED"
done

run() { # decade dir cpus parts jvm
  local dec=$1 dir=$2 cpus=$3 parts=$4 jvm=$5
  echo "=== FoldProbe $dec jvm$jvm (cpus=$cpus parts=$parts) $(date -u +%H:%M:%S)"
  SPARK_GRAFT_CPUS=$cpus SPARK_GRAFT_SHUFFLE_PARTITIONS=$parts \
    java $JOPTS -cp "$CP" graft.tools.FoldProbe "$dir" \
      "$OUT/${dec}_jvm${jvm}.json" 2 1000 \
      > "$OUT/${dec}_jvm${jvm}.log" 2>&1
  tail -n 1 "$OUT/${dec}_jvm${jvm}.json"
}

for jvm in 1 2; do
  run x1 /tmp/x1 32 32 "$jvm"
  run x10 /tmp/x10 32 32 "$jvm"
  run x100 /tmp/x100 32 32 "$jvm"
done
for jvm in 1 2; do
  run x1000 /tmp/x1000 32 512 "$jvm"
done
echo "all decades done: $OUT"
