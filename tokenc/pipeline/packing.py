"""Sequence packing: concatenate pre-tokenized documents in a fixed
global order (EOS-separated) and cut the token stream into fixed-length
training windows — the standard "GPT-style" pack step between a tokenized
corpus and a trainer, run here over the engine's own decoded output so it
composes with encode→decode (the north-star table shape: doc_id, tokens,
n_tok, source).

Scale design (the part that matters at 10^12 sequences):

* The global token offset of each document is a prefix sum over the
  corpus order. A single unpartitioned window would serialize on one
  task, so it's computed in the classic two-phase form instead:
  `repartitionByRange(order_col)` gives range-ordered partitions, a
  per-partition running sum (window PARTITION BY partition id — fully
  parallel) gives local offsets, and the per-partition totals — one row
  per partition, collected to the driver and cumulated there, O(parts)
  bytes not O(rows) — are broadcast-joined back as partition bases.
* No per-token explode: each document emits one array *slice* per
  overlapping window (≤ ceil(n/L)+1 slices), so the single shuffle
  moves token arrays once, keyed by seq_id (dense integers → uniform).
  Reassembly is array_sort + flatten, all JVM expressions; no Python in
  the per-row path anywhere.

The reference has no packing analog (it stops at column encode/decode,
parquet-go reader/writer); this is one of the beyond-reference
training-pipeline operators the graft adds, same tier as dedup/simsearch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_sequences(df: DataFrame, seq_len: int, *,
                   eos_token: int | None = None,
                   order_col: str = "doc_id",
                   tokens_col: str = "tokens",
                   num_partitions: int | None = None) -> DataFrame:
    """Pack `tokens_col` arrays into windows of exactly `seq_len` tokens
    (the final window may be shorter). Documents are concatenated in
    ascending `order_col` order (values must be unique — ties would make
    the packing nondeterministic), each followed by `eos_token` if given.

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

    d = (d.repartitionByRange(num_partitions, "_ord")
          .sortWithinPartitions("_ord")
          .withColumn("_pid", F.spark_partition_id()))

    # phase 1: per-partition totals → driver prefix (range partitioner
    # assigns ascending key ranges to ascending partition ids; the main
    # action below reuses this job's shuffle files — the exchange stage
    # shows as skipped, no second scan)
    totals = {int(r["_pid"]): int(r["s"])
              for r in d.groupBy("_pid").agg(F.sum("_n").alias("s")).collect()}
    bases, acc = [], 0
    for pid in sorted(totals):
        bases.append((pid, acc))
        acc += totals[pid]
    if not bases:
        return spark.createDataFrame(
            [], "seq_id long, tokens array<int>, n_tok int, n_docs int")
    base_df = spark.createDataFrame(bases, "_bpid int, _base long")

    # phase 2: local running sum + broadcast base = global offset
    w = (Window.partitionBy("_pid").orderBy("_ord")
         .rowsBetween(Window.unboundedPreceding, -1))
    d = (d.withColumn("_local", F.coalesce(F.sum("_n").over(w), F.lit(0)))
          .join(F.broadcast(base_df), F.col("_pid") == F.col("_bpid"))
          .withColumn("_off", F.col("_base") + F.col("_local")))

    # one slice per overlapping window, then reassemble per seq_id
    L = F.lit(int(seq_len))
    first = F.floor(F.col("_off") / L)
    last = F.floor((F.col("_off") + F.col("_n") - 1) / L)
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
