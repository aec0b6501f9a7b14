#!/usr/bin/env bash
# Launch the N-vs-4N scaling measurement through spark-submit (the
# north_star launch path), running each level as separate 1-core executor
# JVMs via local-cluster[n,1,6144]. Usage:
#   tools/spark_submit_scaling.sh [nPages] [nEntities] [level...]
# Defaults: 2000000 80000 1 4 16. Prints one JSON line (see
# BENCH_SCALING.json for the recorded result).
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch package > /dev/null
export SPARK_SCALA_VERSION=2.13   # executor spawn needs it outside bin/spark-class
export GRAFT_SCALING_LOCAL_CLUSTER=1
# "${@:-}" would expand to ONE empty-string arg when no args are given
# (crashing args(0).toLong); default explicitly instead.
[ $# -eq 0 ] && set -- 2000000 80000 1 4 16
exec /opt/spark/bin/spark-submit \
  --master 'local[1]' \
  --driver-memory 8g \
  --class graft.er.ScalingBench \
  target/scala-2.13/adrspark_2.13-0.1.0.jar \
  "$@"
