#!/bin/bash
# Capture the scale ladder (sf0.1 -> sf1 -> sf3) for SCALING.md.
# Data: regenerate with
#   sbt "runMain graft.tools.GenSf /root/testdata/sf0.1 localdata/sf1 10"
#   sbt "runMain graft.tools.GenSf /root/testdata/sf0.1 localdata/sf3 30"
# Round suffix via $1 (default r14).
cd /root/repo
R=${1:-r15}
set -x
# compile first: the capture loop runs java straight against
# target/scala-2.13/classes, so stale or missing classes would
# otherwise be benched silently as if current
sbt -batch compile || exit 1
for pair in "/root/testdata/sf0.1 BENCH_LOCAL_${R}_sf0.1.json" "localdata/sf1 BENCH_LOCAL_${R}_sf1.json" "localdata/sf3 BENCH_LOCAL_${R}_sf3.json"; do
  set -- $pair
  dir=$1; out=$2
  echo "=== bench $dir -> $out ==="
  # -Xmx matches the sbt-forked run's SPARK_DRIVER_MEM default (8g):
  # an oversized heap (an earlier capture used 100g) accumulates
  # enormous young generations between collections and every query
  # absorbs multi-second GC pauses — a uniform ~10s floor that reads
  # as fake super-linearity at sf3. Blocks past 8g spill to disk,
  # which is the honest cluster-like configuration.
  SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_CPUS=32 java -Xmx${SPARK_DRIVER_MEM:-8g} \
    -cp "/opt/spark/jars/*:target/scala-2.13/classes" graft.Bench 2>/dev/null \
    | grep -o '{"metric":"total".*}' | tail -1 > $out
  echo "=== done $out: $(head -c 120 $out)"
done
echo "ALL_BENCHES_DONE"
