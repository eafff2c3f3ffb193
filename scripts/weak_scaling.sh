#!/bin/bash
# Weak-scaling evidence: fixed work PER CORE (docs ∝ cores) — the faithful
# proxy for N→4N executors over a dataset that grows with the cluster
# (10^12 sequences >> any cluster). Ideal: constant wall; efficiency =
# T_N / T_4N. Interleaved 2 rounds, min per level, same estimator as
# run_scaling.sh.
set -e
cd "$(dirname "$0")/.."
export MALLOC_MMAP_THRESHOLD_=17179869184
export MALLOC_TRIM_THRESHOLD_=17179869184
rm -f /tmp/tokenc.zip
(zip -qr /tmp/tokenc.zip tokenc -x '*__pycache__*')

declare -A DOCS=( [2]=250000 [4]=500000 [8]=1000000 [16]=2000000 )
run() {
  local cpus=$1 tag=$2
  local docs=${DOCS[$cpus]}
  SPARK_GRAFT_CPUS=$cpus TOKENC_DOCS=$docs \
  TOKENC_SRC_DIR=/dev/shm/tokenc_ws_src_$docs TOKENC_BENCH_DIR=/dev/shm/tokenc_ws_$tag \
  TOKENC_BENCH_SECONDARY=0 \
  spark-submit --master "local[$cpus]" \
    --driver-memory 16g --conf spark.driver.extraJavaOptions=-XX:+UseParallelGC \
    --py-files /tmp/tokenc.zip \
    --conf spark.sql.shuffle.partitions=$cpus \
    bench.py 2>/dev/null | grep '^{' | tail -1 | tee /tmp/bench_ws_${tag}.json
}
echo "=== generate sources (untimed, 32 cores) ==="
for c in 2 4 8 16; do
  d=${DOCS[$c]}
  if [ ! -f /dev/shm/tokenc_ws_src_$d/_SUCCESS ]; then
    SPARK_GRAFT_CPUS=32 TOKENC_DOCS=$d TOKENC_SRC_DIR=/dev/shm/tokenc_ws_src_$d \
    TOKENC_BENCH_DIR=/dev/shm/tokenc_ws_gen TOKENC_BENCH_SECONDARY=0 \
    timeout 900 python bench.py >/dev/null 2>&1 || true
  fi
done
echo "=== interleaved weak-scaling runs ==="
for round in a b; do
  for c in 2 8 4 16; do
    echo "--- local[$c] x ${DOCS[$c]} docs ($round)"
    run $c n${c}_$round
  done
done
