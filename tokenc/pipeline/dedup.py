"""Deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Every hash here is built from integer arithmetic expressible in both Spark
SQL and DuckDB SQL (no engine-specific hash builtins), so the driver's
oracle can replicate results bit-for-bit. Shared primitives:

    word_id(w)   = (length(w)*31 + ascii(first)*7 + ascii(last)) % 50000
    shingle_h    = (w1*2654435761 + w2*40503 + w3) % 2^31
    perm_i(h)    = (A_i*h + B_i) % 2147483647   (fixed seeded constants)

Scale notes: MinHash signatures are computed with JVM-side higher-order
functions (transform/array_min) — no Python in the per-doc path; the LSH
band explode → groupBy bucket is the one shuffle, keyed by (band, hash) so
it spreads uniformly; candidate verification joins only within buckets.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, functions as F

K_PERMS = 32
BANDS = 8
ROWS_PER_BAND = K_PERMS // BANDS
MERSENNE = 2147483647
SHINGLE = 3

_rng = random.Random(1234)
PERM_A = [_rng.randrange(1, MERSENNE) for _ in range(K_PERMS)]
PERM_B = [_rng.randrange(0, MERSENNE) for _ in range(K_PERMS)]

WORD_ID = ("(length({w})*31 + ascii(substr({w}, 1, 1))*7 + "
           "ascii(substr({w}, length({w}), 1))) % 50000")


def words_expr(col: str = "text") -> str:
    return f"filter(split({col}, ' '), w -> length(w) > 0)"


def shingles_expr(col: str = "text") -> str:
    """Word-3-gram integer shingle hashes (sorted distinct) over the
    `wids` column with_shingles materializes (the word-id array is
    referenced three times per shingle; inlining its transform would make
    Spark recompute it 3× per doc — no common-subexpression elimination
    inside higher-order-function lambdas). Zero-word documents
    (empty/whitespace-only text, common in web corpora) get an
    EMPTY array: without the guard, least(i+1, size(ws)) hits index 0 and
    Spark raises 'SQL array indices start at 1' (the DuckDB oracle's
    matching guard is the empty range in oracles._shingle_cte)."""
    return (
        f"case when size(ws) = 0 then cast(array() as array<bigint>) else "
        f"array_sort(array_distinct(transform("
        f"  sequence(1, greatest(size(ws) - {SHINGLE - 1}, 1)),"
        f"  i -> (element_at(wids, i) * 2654435761L"
        f"        + element_at(wids, least(i + 1, size(ws))) * 40503L"
        f"        + element_at(wids, least(i + 2, size(ws)))) % 2147483648L)))"
        f" end"
    )


def with_shingles(docs: DataFrame, text_col: str = "text") -> DataFrame:
    wid = WORD_ID.format(w="w")
    return (docs
            .withColumn("ws", F.expr(words_expr(text_col)))
            .withColumn("wids",
                        F.expr(f"transform(ws, w -> cast({wid} as bigint))"))
            .withColumn("shingles", F.expr(shingles_expr(text_col)))
            .drop("ws", "wids"))


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact content dedup: one keeper per distinct text."""
    return (docs.groupBy(F.sha2(F.col("text"), 256).alias("content_sha"))
            .agg(F.count("*").alias("dup_count"),
                 F.min(F.col("doc_id").cast("long")).alias("keeper_id")))


def content_representatives(docs: DataFrame) -> DataFrame:
    """One keeper doc per distinct text (min doc_id). Running LSH over
    representatives instead of raw docs is the first bucket-skew guard: a
    web corpus's normal degenerate case — 10^6 byte-identical boilerplate
    docs — collapses to ONE signature instead of one bucket of 10^6."""
    return (docs
            .groupBy("text")
            .agg(F.min(F.col("doc_id").cast("long")).alias("doc_id"))
            .select("doc_id", "text"))


def minhash_signature(docs: DataFrame) -> DataFrame:
    """(doc_id, band, band_hash) rows — JVM-side minhash over shingles."""
    sig_terms = []
    for i in range(K_PERMS):
        sig_terms.append(
            f"array_min(transform(shingles, h -> (h * {PERM_A[i]}L + {PERM_B[i]}L) % {MERSENNE}L))")
    band_cols = []
    for b in range(BANDS):
        terms = sig_terms[b * ROWS_PER_BAND:(b + 1) * ROWS_PER_BAND]
        combined = " + ".join(f"({t}) * {31 ** j}L" for j, t in enumerate(terms))
        band_cols.append(f"(({combined}) % 9223372036854775783L) as band_{b}")
    sh = with_shingles(docs)
    sel = sh.selectExpr("cast(doc_id as long) as doc_id", *band_cols)
    stack = ", ".join(f"{b}L, band_{b}" for b in range(BANDS))
    return sel.selectExpr("doc_id",
                          f"stack({BANDS}, {stack}) as (band, band_hash)")


DEFAULT_BUCKET_CAP = 64


def minhash_candidates(docs: DataFrame,
                       bucket_cap: int = DEFAULT_BUCKET_CAP,
                       reps: DataFrame | None = None) -> DataFrame:
    """Candidate near-dup pairs: representatives sharing any LSH band bucket.

    Two skew guards keep the bucket self-join from going quadratic at scale
    (the 100-TB failure mode — one degenerate bucket emitting ~10^12 pairs
    in a single task):
      1. signatures are computed over exact-content REPRESENTATIVES, so
         byte-identical duplicates can never pile into one bucket;
      2. buckets wider than `bucket_cap` distinct texts are dropped entirely
         (deterministic, mirrored in the DuckDB oracle) — a bucket that wide
         is boilerplate-like content better handled by exact/doc-level
         rules, and the pair explosion is bounded by cap^2 per bucket.
    """
    sig = minhash_signature(
        reps if reps is not None else content_representatives(docs))
    if bucket_cap is not None:
        # one small aggregate on the (band, band_hash) key, then semi-filter
        ok = (sig.groupBy("band", "band_hash").count()
              .where(F.col("count") <= bucket_cap).drop("count"))
        sig = sig.join(ok, ["band", "band_hash"])
    a = sig.alias("a")
    b = sig.alias("b")
    pairs = (a.join(b, ["band", "band_hash"])
             .where(F.col("a.doc_id") < F.col("b.doc_id"))
             .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
             .distinct())
    return pairs


def minhash_neardup(docs: DataFrame, threshold: float = 0.6,
                    bucket_cap: int = DEFAULT_BUCKET_CAP) -> DataFrame:
    """Verified near-dup pairs (over content representatives) with exact
    shingle Jaccard ≥ threshold."""
    # one representatives pass shared by signatures and verification (the
    # groupBy(text) is the expensive full-corpus stage — don't run it twice)
    reps = content_representatives(docs)
    sh = with_shingles(reps).select(F.col("doc_id").cast("long").alias("doc_id"), "shingles")
    pairs = minhash_candidates(docs, bucket_cap=bucket_cap, reps=reps)
    j = (pairs
         .join(sh.withColumnRenamed("doc_id", "id_a").withColumnRenamed("shingles", "sh_a"), "id_a")
         .join(sh.withColumnRenamed("doc_id", "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
         .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
         .withColumn("uni", F.size(F.array_union("sh_a", "sh_b")))
         .withColumn("jaccard", F.round(F.col("inter") / F.col("uni"), 6))
         .where(F.col("jaccard") >= threshold)
         .select("id_a", "id_b", "jaccard"))
    return j


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """Per-doc SimHash over word ids: bit b set iff sum(±1 weighted by word
    bit b) > 0. Pure JVM expressions (transform + aggregate)."""
    wid = WORD_ID.format(w="w")
    bit_terms = " + ".join(
        f"(case when aggregate(wh, 0L, (acc, h) -> acc + (case when (h & {1 << b}L) > 0 "
        f"then 1L else -1L end)) > 0 then {1 << b}L else 0L end)"
        for b in range(bits))
    return (docs
            .withColumn("wh", F.expr(
                f"transform({words_expr('text')}, w -> cast({wid} as bigint) * 2654435761L % 4294967296L)"))
            .selectExpr("cast(doc_id as long) as doc_id", f"({bit_terms}) as simhash")
            )
