#!/bin/bash
# One fresh-JVM bench run of graft.Bench, writing the single-line JSON
# to $1 (default bench_out.json) via SPARK_GRAFT_BENCH_OUT. Mirrors the
# sbt `run / fork` JVM flags so the measurement JVM is identical whether
# launched here or via sbt — but without sbt's launcher overhead, so
# back-to-back runs on a quiet host measure the engine, not the build
# tool. Feeds the min-of-N merge protocol (tools/merge_bench.py).
set -euo pipefail
OUT="${1:-bench_out.json}"
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
         sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
SPARK_GRAFT_BENCH_OUT="$OUT" exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CP" \
  graft.Bench > "${OUT%.json}.stdout.log" 2> "${OUT%.json}.stderr.log"
