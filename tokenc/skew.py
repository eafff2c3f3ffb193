"""Skew defusal for long-sequence documents.

A 10^6-token doc in a partition of 10^2-token docs wrecks task balance (the
north rule calls this out). Two mechanisms, both pure DataFrame ops:

  * `split_long_docs`: oversized docs become (doc_id, seq_no) sub-rows of at
    most `max_tokens` tokens — one JVM-side slice/posexplode pass over only
    the oversized rows, unioned with the untouched fast path; an `n_parts`
    column marks split docs so reassembly needs no extra pass;
  * `reassemble_docs`: inverse — shuffles only rows with n_parts > 1
    (usually a tiny fraction), sort_array by seq_no, flatten.

encode_df's byte-bounded row groups handle moderate skew already; splitting
is for the pathological tail so a single doc never exceeds one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SPLIT_COLS = ["doc_id", "seq_no", "n_parts", "tokens", "n_tok", "source"]


def split_long_docs(df: DataFrame, max_tokens: int = 8192) -> DataFrame:
    """tokens table → same + (seq_no, n_parts), every row ≤ max_tokens tokens."""
    small = (df.where((F.col("n_tok").isNull()) | (F.col("n_tok") <= max_tokens))
             .withColumn("seq_no", F.lit(0))
             .withColumn("n_parts", F.lit(1)))
    big = df.where(F.col("n_tok") > max_tokens)
    parts = big.select(
        "doc_id", "source",
        F.expr(f"cast((n_tok + {max_tokens} - 1) div {max_tokens} as int)").alias("n_parts"),
        F.posexplode(F.expr(
            f"transform(sequence(0, (n_tok - 1) div {max_tokens}), "
            f"i -> slice(tokens, i * {max_tokens} + 1, {max_tokens}))"
        )).alias("seq_no", "tokens"),
    ).withColumn("n_tok", F.size("tokens"))
    return small.select(*SPLIT_COLS).unionByName(parts.select(*SPLIT_COLS))


def reassemble_docs(df: DataFrame) -> DataFrame:
    """Inverse of split_long_docs. Shuffles only multi-part docs."""
    fast = df.where(F.col("n_parts") == 1).select("doc_id", "tokens", "n_tok", "source")
    multi = df.where(F.col("n_parts") > 1)
    packed = (multi.groupBy("doc_id")
              .agg(F.flatten(F.expr(
                  "sort_array(collect_list(struct(seq_no, tokens)))").tokens).alias("tokens"),
                   F.first("source").alias("source"))
              .withColumn("n_tok", F.size("tokens"))
              .select("doc_id", "tokens", "n_tok", "source"))
    return fast.unionByName(packed)
