#!/bin/bash
cd /root/repo
set -x
for pair in "/root/testdata/sf0.1 BENCH_LOCAL_r13_sf0.1.json" "localdata/sf1 BENCH_LOCAL_r13_sf1.json" "localdata/sf3 BENCH_LOCAL_r13_sf3.json"; do
  set -- $pair
  dir=$1; out=$2
  echo "=== bench $dir -> $out ==="
  SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep -o '{"metric":"total".*}' | tail -1 > $out
  echo "=== done $out: $(head -c 120 $out)"
done
echo "ALL_BENCHES_DONE"
