#!/bin/bash
# Scaling-efficiency protocol: same job at N and 4N parallelism, plus the
# machine's own memory-bandwidth envelope, in ONE interleaved execution.
# Packages tokenc.zip and launches via spark-submit --py-files, per the
# north rule. Writes BENCH/BASELINE.md (scaling_report.py).
#
# Three measurements, interleaved (this sandbox's throughput drifts
# several-fold over minutes, so only adjacent runs compare; min-per-level /
# max-per-level aggregation estimates machine capability):
#   * STRONG scaling: fixed input (1M docs), cores 2 4 8 16 32 — pessimistic:
#     per-core work shrinks and the shared memory bus saturates.
#   * WEAK scaling: fixed work PER CORE (docs ∝ cores) — the faithful proxy
#     for N→4N executors over a corpus that grows with the cluster
#     (10^12 sequences >> any cluster).
#   * MEMBW envelope: aggregate memcpy bandwidth at the same process
#     counts, run three times interleaved WITH the bench rounds — the
#     in-protocol normalizer for the headline metric (see
#     scaling_report.py for the declared definition).
#
# Encode and decode are both amortized in-protocol (ENCODE_REPEAT /
# DECODE_REPEAT pass the file list 4x in one job; per-pass numbers
# reported) so few-second walls aren't dominated by per-job fixed costs.
set -e
cd "$(dirname "$0")/.."

export MALLOC_MMAP_THRESHOLD_=17179869184
export MALLOC_TRIM_THRESHOLD_=17179869184

rm -f /tmp/tokenc.zip
(zip -qr /tmp/tokenc.zip tokenc -x '*__pycache__*')

SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
STRONG_DOCS=${TOKENC_DOCS:-1000000}
STRONG_LEVELS=${TOKENC_LEVELS:-"2 4 8 16 32"}
WEAK_LEVELS=${TOKENC_WEAK_LEVELS:-"2 4 8 16"}
ROUNDS=${TOKENC_ROUNDS:-"a b"}
declare -A WDOCS=( [2]=250000 [4]=500000 [8]=1000000 [16]=2000000 )
for c in $WEAK_LEVELS; do
  # an unlisted level would expand ${WDOCS[$c]} to an EMPTY unquoted arg
  # and silently shift run_window's positionals — fail loudly instead
  [ -n "${WDOCS[$c]:-}" ] || { echo "no WDOCS entry for weak level $c" >&2; exit 2; }
done
# keep the deterministic source dirs (tokenc_ws_src_*) — their _SUCCESS
# check below reuses them across invocations; clean everything else,
# INCLUDING stale bench/window/membw JSONs whose globs scaling_report
# reads (a leftover level from a previous config would silently join
# this run's tables)
rm -rf /dev/shm/tokenc_bench_* /dev/shm/tokenc_ws_gen* /dev/shm/spark_local
rm -f /tmp/bench_*.json /tmp/membw_*.json /tmp/window_*.json /tmp/gate_summary.json

run() {  # $1 cpus, $2 docs, $3 src_dir, $4 tag
  SPARK_GRAFT_SF_DIR=$SF_DIR SPARK_GRAFT_CPUS=$1 TOKENC_DOCS=$2 \
  TOKENC_SRC_DIR=$3 TOKENC_BENCH_DIR=/dev/shm/tokenc_bench_$4 \
  TOKENC_ENCODE_REPEAT=${TOKENC_ENCODE_REPEAT:-4} \
  TOKENC_DECODE_REPEAT=${TOKENC_DECODE_REPEAT:-4} \
  TOKENC_BENCH_SECONDARY=${TOKENC_BENCH_SECONDARY:-0} \
  spark-submit --master "local[$1]" \
    --driver-memory 16g --conf spark.driver.extraJavaOptions=-XX:+UseParallelGC \
    --py-files /tmp/tokenc.zip \
    --conf spark.sql.shuffle.partitions=$1 \
    bench.py 2>/tmp/bench_$4.stderr | grep '^{' | tail -1 > /tmp/bench_$4.json
  if [ ! -s /tmp/bench_$4.json ]; then
    # a crashed spark-submit must stop the protocol HERE, not surface as
    # a missing level an hour later in scaling_report
    echo "bench window $4 produced no JSON; last stderr:" >&2
    tail -20 /tmp/bench_$4.stderr >&2
    exit 3
  fi
  cat /tmp/bench_$4.json
}

# measurement WINDOW = spot-probe, bench run, spot-probe. The bracketing
# probes (scripts/membw_probe.py --spot, ~2s) record the machine's state
# around the run; the post-pass gate below discards + re-runs windows
# whose probe collapsed >30% under the round median (sandbox throttling,
# historically concentrated on the largest/last configs).
run_window() {  # $1 cpus, $2 docs, $3 src_dir, $4 tag
  local pre post
  pre=$(python scripts/membw_probe.py --spot 4)
  run "$1" "$2" "$3" "$4"
  post=$(python scripts/membw_probe.py --spot 4)
  printf '{"tag": "%s", "pre": %s, "post": %s}\n' "$4" "$pre" "$post" \
    > /tmp/window_$4.json
  echo "    window $4: spot pre=$pre post=$post GB/s"
}

# tag → (cpus, docs, src) for gate re-runs; tags are s<cpus>_<round> /
# w<cpus>_<round>
rerun_tag() {
  local tag=$1 kind=${1:0:1} c rest
  rest=${tag#?}
  c=${rest%%_*}
  if [ "$kind" = s ]; then
    run_window "$c" "$STRONG_DOCS" "$STRONG_SRC" "$tag"
  else
    run_window "$c" "${WDOCS[$c]}" "/dev/shm/tokenc_ws_src_${WDOCS[$c]}" "$tag"
  fi
}

echo "=== generate shared sources (untimed, 32 cores) ==="
for c in $WEAK_LEVELS; do
  d=${WDOCS[$c]}
  if [ ! -f /dev/shm/tokenc_ws_src_$d/_SUCCESS ]; then
    SPARK_GRAFT_CPUS=32 TOKENC_DOCS=$d TOKENC_SRC_DIR=/dev/shm/tokenc_ws_src_$d \
    TOKENC_BENCH_DIR=/dev/shm/tokenc_ws_gen TOKENC_ENCODE_REPEAT=1 \
    TOKENC_DECODE_REPEAT=1 TOKENC_BENCH_SECONDARY=0 \
    timeout 900 python bench.py >/dev/null 2>&1 || true
  fi
done
STRONG_SRC=/dev/shm/tokenc_ws_src_$STRONG_DOCS

echo "=== warmup (untimed) ==="
run 32 $STRONG_DOCS $STRONG_SRC warmup >/dev/null

echo "=== membw probe 1/3 ==="
python scripts/membw_probe.py 2 4 8 16 32 | tee /tmp/membw_1.json

rm -f /tmp/window_*.json
NPROBE=1
for round in $ROUNDS; do
  echo "=== strong-scaling runs ($round) ==="
  for c in $STRONG_LEVELS; do
    echo "--- strong local[$c] ($round)"
    run_window $c $STRONG_DOCS $STRONG_SRC s${c}_$round
  done
  echo "=== weak-scaling runs ($round) ==="
  for c in $WEAK_LEVELS; do
    echo "--- weak local[$c] x ${WDOCS[$c]} docs ($round)"
    run_window $c ${WDOCS[$c]} /dev/shm/tokenc_ws_src_${WDOCS[$c]} w${c}_$round
  done
  NPROBE=$((NPROBE+1))
  echo "=== membw probe $NPROBE/3 ==="
  python scripts/membw_probe.py 2 4 8 16 32 | tee /tmp/membw_$NPROBE.json
done

echo "=== throttle gate: discard + re-run collapsed windows ==="
MEDIAN=$(python scripts/window_gate.py median '/tmp/window_*.json')
echo "round median spot: $MEDIAN GB/s (reject < 70%)"
for attempt in 1 2; do
  REJ=$(python scripts/window_gate.py rejected '/tmp/window_*.json' --median $MEDIAN)
  [ -z "$REJ" ] && break
  echo "--- gate attempt $attempt: re-running [$REJ]"
  for tag in $REJ; do rerun_tag "$tag"; done
done
# NOTE: write the summary OUTSIDE the window_*.json glob (tee creates the
# file before python reads the glob, so a window_-prefixed name would make
# the gate read its own empty output)
python scripts/window_gate.py summary '/tmp/window_*.json' --median $MEDIAN \
  | tee /tmp/gate_summary.json

python scripts/scaling_report.py \
    --strong-levels "$(echo $STRONG_LEVELS | tr ' ' ',')" \
    --weak-levels "$(echo $WEAK_LEVELS | tr ' ' ',')" \
    --headline "${TOKENC_HEADLINE:-2,8}" \
    --strong-glob '/tmp/bench_s{level}_*.json' \
    --weak-glob '/tmp/bench_w{level}_*.json' \
    --membw '/tmp/membw_*.json' \
    --gate /tmp/gate_summary.json \
    --extra BENCH/EXTRA.md
