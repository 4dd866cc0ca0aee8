#!/usr/bin/env bash
# Fresh-JVM, jar-direct graft.Bench launcher — the ONE invocation shape
# shared by the round close, broadcast-vs-shuffle A/Bs, and the guard
# triage automation (tools/guard_triage.py), so "controlled re-time"
# always means the same JVM flags, heap, and core count.
#
# Env knobs (all optional):
#   SPARK_GRAFT_SF_DIR     data dir        (default /root/testdata/sf0.1)
#   SPARK_GRAFT_CPUS       local[] threads (default 32 — the driver's value)
#   SPARK_GRAFT_ONLY       comma list of query names and/or
#                          variant_<name> entries to time (focused A/B:
#                          each listed variant gets warm-up + min-of-3)
#   SPARK_GRAFT_BENCH_OUT  sidecar path    (default /tmp/graft_bench_times.json;
#                          ONLY the round close points this at the repo)
#
# Module flags below are Spark 4.1.2's own JavaModuleOptions defaults.
set -euo pipefail
cd "$(dirname "$0")/.."
JAR=target/scala-2.13/etlairflowspotifyspark_2.13-0.1.0.jar
[ -f "$JAR" ] || { echo "jar missing — run: sbt -batch package" >&2; exit 1; }
exec java -Xmx100g \
  -XX:+IgnoreUnrecognizedVMOptions --add-modules=jdk.incubator.vector \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  --add-opens=java.security.jgss/sun.security.krb5=ALL-UNNAMED \
  -Djdk.reflect.useDirectMethodHandle=false \
  -Dio.netty.tryReflectionSetAccessible=true \
  -Dio.netty.allocator.type=pooled \
  --enable-native-access=ALL-UNNAMED \
  -cp "$JAR:/opt/spark/jars/*" graft.Bench "$@"
