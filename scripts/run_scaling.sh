#!/bin/bash
# Scaling-efficiency evidence: same job, same input, local[8] vs local[32]
# (sandbox proxy for N vs 4N executors). Packages tokenc.zip and launches via
# spark-submit --py-files, per the north rule. Writes BENCH/BASELINE.md.
#
# Protocol: untimed warmup, then INTERLEAVED repeated runs (8,32,8,32) with
# min-per-level aggregation — this sandbox's throughput drifts several-fold
# over minutes, so adjacent interleaving + min is the only stable estimator.
set -e
cd "$(dirname "$0")/.."

export MALLOC_MMAP_THRESHOLD_=17179869184
export MALLOC_TRIM_THRESHOLD_=17179869184

rm -f /tmp/tokenc.zip
(zip -qr /tmp/tokenc.zip tokenc -x '*__pycache__*')

SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
DOCS=${TOKENC_DOCS:-1000000}
SRC=/dev/shm/tokenc_bench_src
rm -rf $SRC /dev/shm/tokenc_bench_* /dev/shm/spark_local

run() {
  local cpus=$1 tag=$2
  SPARK_GRAFT_SF_DIR=$SF_DIR SPARK_GRAFT_CPUS=$cpus TOKENC_DOCS=$DOCS \
  TOKENC_SRC_DIR=$SRC TOKENC_BENCH_DIR=/dev/shm/tokenc_bench_$tag \
  spark-submit --master "local[$cpus]" \
    --driver-memory 16g --conf spark.driver.extraJavaOptions=-XX:+UseParallelGC \
    --py-files /tmp/tokenc.zip \
    --conf spark.sql.shuffle.partitions=$cpus \
    bench.py 2>/dev/null | grep '^{' | tail -1 > /tmp/bench_$tag.json
  cat /tmp/bench_$tag.json
}

echo "=== warmup (untimed) ==="
run 32 warmup >/dev/null
echo "=== interleaved runs ==="
for round in a b; do
  echo "--- local[8] ($round)"
  run 8 n8_$round
  echo "--- local[32] ($round)"
  run 32 n32_$round
done

python scripts/scaling_report.py --n8 /tmp/bench_n8_a.json /tmp/bench_n8_b.json \
                                 --n32 /tmp/bench_n32_a.json /tmp/bench_n32_b.json
