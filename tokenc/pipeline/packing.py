"""Sequence packing: concatenate pre-tokenized documents in a fixed
global order (EOS-separated) and cut the token stream into fixed-length
training windows — the standard "GPT-style" pack step between a tokenized
corpus and a trainer, run here over the engine's own decoded output so it
composes with encode→decode (the north-star table shape: doc_id, tokens,
n_tok, source).

Scale design (the part that matters at 10^12 sequences):

* The global token offset of each document is a prefix sum over the
  corpus order. A single unpartitioned window would serialize on one
  task, so it's computed in the classic two-phase form: range buckets →
  per-bucket running sum (window PARTITION BY bucket — fully parallel)
  plus per-bucket bases (running sum over the tiny per-bucket totals,
  broadcast-joined back).
* Every step is a PURE FUNCTION OF THE DATA — no RangePartitioner.
  `repartitionByRange` re-SAMPLES its boundaries per job (the sampler
  seed derives from the RDD id), so two actions over the same lineage
  can assign boundary docs different partition ids; bases computed in
  one job would then be joined against offsets computed under another
  job's boundaries, silently shifting every window after the first
  divergent doc. Here the bucket id is `|{b ∈ boundaries : b < ord}|`
  with boundaries drawn by a deterministic value-hash sample (per
  xxhash64 bucket, the row minimizing (hash, ord) — a uniform draw,
  reproducible on any re-execution), so re-running any stage, losing
  any executor, or evaluating the lineage twice inside one plan always
  lands every doc in the same bucket.
* The per-bucket bases are computed IN THE SAME PLAN as the offsets: a
  running-sum window over the ≤P-row bucket-totals aggregate (single
  partition over metadata-scale rows), broadcast-joined back. No
  driver collect of data, and even if Catalyst evaluates the upstream
  twice (agg branch + main branch), determinism makes both evaluations
  agree.
* No per-token explode: each document emits one array *slice* per
  overlapping window (≤ ceil(n/L)+1 slices), so the single data shuffle
  moves token arrays once, keyed by seq_id (dense integers → uniform).
  Reassembly is array_sort + flatten, all JVM expressions; no Python in
  the per-row path anywhere.

The reference has no packing analog (it stops at column encode/decode,
parquet-go reader/writer); this is one of the beyond-reference
training-pipeline operators the graft adds, same tier as dedup/simsearch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _sample_boundaries(d: DataFrame, num_partitions: int) -> list:
    """Deterministic quantile boundaries for `_ord`: one uniform sample
    per xxhash64 bucket (the row minimizing (hash, _ord) within its
    bucket is a uniform draw independent of _ord, and min_by over the
    lexicographic (hash, _ord) struct is tie-proof), sorted on the
    driver, thinned to num_partitions-1 cut points. O(S) rows collected
    (S = 32 per target bucket), pure function of the data values."""
    s = max(num_partitions * 32, 64)
    sample = (d.groupBy(F.pmod(F.xxhash64("_ord"), F.lit(s)).alias("_hb"))
                .agg(F.expr("min_by(_ord, struct(xxhash64(_ord), _ord))")
                     .alias("_s"))
                .select("_s").collect())
    vals = sorted({r["_s"] for r in sample})
    if len(vals) <= 1:
        return []
    step = len(vals) / num_partitions
    bounds = {vals[int(i * step)] for i in range(1, num_partitions)}
    bounds.discard(vals[0])  # bucket 0 must be non-empty-able
    return sorted(bounds)


def pack_sequences(df: DataFrame, seq_len: int, *,
                   eos_token: int | None = None,
                   order_col: str = "doc_id",
                   tokens_col: str = "tokens",
                   num_partitions: int | None = None,
                   boundaries: list | None = None) -> DataFrame:
    """Pack `tokens_col` arrays into windows of exactly `seq_len` tokens
    (the final window may be shorter). Documents are concatenated in
    ascending `order_col` order (values must be unique — ties would make
    the packing nondeterministic), each followed by `eos_token` if given.

    `boundaries` (optional, sorted, strictly increasing `order_col`
    values) pre-splits the corpus into prefix-sum buckets; when omitted
    they are drawn by a deterministic hash sample (one extra scan of
    `(order_col, tokens_col)` — callers at scale with a known-dense key
    can pass explicit cut points to skip it).

    Returns (seq_id long, tokens array, n_tok int, n_docs int) where
    n_docs counts the documents contributing at least one token to the
    window.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    t = F.col(tokens_col)
    if eos_token is not None:
        t = F.concat(t, F.array(F.lit(eos_token).cast("int")))
    d = (df.select(F.col(order_col).alias("_ord"), t.alias("_t"))
           .withColumn("_n", F.size("_t").cast("long"))
           .filter(F.col("_n") > 0))

    if boundaries is None:
        boundaries = _sample_boundaries(d, num_partitions)
    if boundaries:
        bs = F.array(*[F.lit(b) for b in boundaries])
        bucket = F.size(F.filter(bs, lambda b: b < F.col("_ord")))
    else:
        bucket = F.lit(0)
    d = d.withColumn("_b", bucket.cast("int"))

    # per-bucket bases in the SAME plan: totals are ≤P rows, so the
    # running-sum window over them is metadata-scale; broadcast back
    wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    bases = (d.groupBy("_b").agg(F.sum("_n").alias("_tot"))
              .withColumn("_base",
                          F.coalesce(F.sum("_tot").over(wb), F.lit(0)))
              .select(F.col("_b").alias("_bb"), "_base"))

    # local running sum within bucket + broadcast base = global offset
    w = (Window.partitionBy("_b").orderBy("_ord")
         .rowsBetween(Window.unboundedPreceding, -1))
    d = (d.withColumn("_local", F.coalesce(F.sum("_n").over(w), F.lit(0)))
          .join(F.broadcast(bases), F.col("_b") == F.col("_bb"))
          .withColumn("_off", F.col("_base") + F.col("_local")))

    # one slice per overlapping window, then reassemble per seq_id.
    # integer `div`, NOT floor(double /): double division loses exactness
    # past 2^53 total tokens — at the 10^12-sequence design point a
    # rounded-up `last` would name a window the doc never reaches and
    # F.slice would reject the negative length
    L = F.lit(int(seq_len))
    first = F.expr(f"_off div {int(seq_len)}")
    last = F.expr(f"(_off + _n - 1) div {int(seq_len)}")
    d = d.select("_ord", "_t", "_n", "_off",
                 F.explode(F.sequence(first, last)).alias("seq_id"))
    start_g = F.greatest(F.col("seq_id") * L, F.col("_off"))
    end_g = F.least((F.col("seq_id") + 1) * L, F.col("_off") + F.col("_n"))
    d = d.select(
        "seq_id",
        F.struct((start_g - F.col("seq_id") * L).alias("o"),
                 F.slice("_t", (start_g - F.col("_off") + 1).cast("int"),
                         (end_g - start_g).cast("int")).alias("s")).alias("ps"))
    out = (d.groupBy("seq_id")
            .agg(F.flatten(F.transform(F.array_sort(F.collect_list("ps")),
                                       lambda x: x["s"])).alias("tokens"),
                 F.count("*").alias("n_docs"))
            .select("seq_id", "tokens",
                    F.size("tokens").alias("n_tok"),
                    F.col("n_docs").cast("int").alias("n_docs")))
    return out
