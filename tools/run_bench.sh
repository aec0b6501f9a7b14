#!/usr/bin/env bash
# Direct JVM launcher for graft.Bench: stdout carries ONLY the one bench
# JSON line (Spark logs go to stderr; no sbt log prefixes). The same line
# is also persisted to BENCH.json / bench_out.json in the cwd.
# Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
#      SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_ER_PAGES (default 50000).
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch package > /dev/null 2>&1
exec /opt/spark/bin/spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-32}]" \
  --driver-memory "${SPARK_DRIVER_MEM:-8g}" \
  --class graft.Bench \
  target/scala-2.13/adrspark_2.13-0.1.0.jar
