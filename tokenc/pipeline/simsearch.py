"""Similarity search over the embeddings table (vec_id, embedding:array<float>, label).

Brute-force cosine top-k as the exactness baseline (JVM-side zip_with +
aggregate — no Python in the inner loop), and a random-hyperplane LSH
bucketed variant as the scale path: at 10^9 vectors the LSH variant's
bucket-join replaces the O(N·Q) cross join with a bucket-local join, and the
hyperplanes being *deterministic integer* constructions keeps it
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

DIM = 64
N_PLANES = 12

# deterministic pseudo-random hyperplanes: plane p component d =
# ((p*131 + d*31 + 7) % 97) - 48  — integer, identical in any SQL engine
PLANE_EXPR = "((({p})*131 + ({d})*31 + 7) % 97) - 48"


def _cosine_expr(a: str, b: str) -> str:
    # nullif guard: an all-zero embedding has norm 0 and would raise
    # DIVIDE_BY_ZERO under ANSI Spark; NULL instead ranks it last (desc
    # ordering is nulls-last) and fails any >= threshold filter —
    # matching the oracle's nullif
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * y), 0D, (s, v) -> s + v) / "
        f"nullif(sqrt(aggregate({a}, 0D, (s, v) -> s + cast(v as double) * v)) * "
        f" sqrt(aggregate({b}, 0D, (s, v) -> s + cast(v as double) * v)), 0D)"
    )


def brute_topk(emb: DataFrame, k: int = 5, n_queries: int = 20) -> DataFrame:
    """Exact cosine top-k for the first `n_queries` vectors (broadcast the
    small query side; the big side streams — scales to any corpus size)."""
    q = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    pairs = (emb.alias("c").join(F.broadcast(q), F.col("c.vec_id") != F.col("query_id"))
             .withColumn("cos", F.expr(_cosine_expr("q_emb", "c.embedding"))))
    w = Window.partitionBy("query_id").orderBy(F.round(F.col("cos"), 6).desc(),
                                               F.col("c.vec_id").asc())
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", F.col("c.vec_id").alias("neighbor_id"),
                    F.round("cos", 4).alias("cosine"), "rank"))


def lsh_tables_signature(emb: DataFrame, n_tables: int, bits: int,
                         with_embedding: bool = False) -> DataFrame:
    """(vec_id, tbl, bucket) — OR-amplified LSH: `n_tables` independent
    hash tables of `bits` sign-bits each (table t's bit j uses hyperplane
    index t*bits + j, all from the same deterministic PLANE_EXPR family).
    `with_embedding` carries the embedding column through the generator —
    consumers that need it (lsh_topk) get it without a corpus-wide
    re-join; bucket-only consumers (embed_neardup's self-join) leave it
    off to keep the shuffle narrow."""
    table_sigs = []
    for t in range(n_tables):
        bit_terms = []
        for j in range(bits):
            plane = PLANE_EXPR.format(p=t * bits + j, d="i - 1")
            dot = (f"aggregate(zip_with(embedding, sequence(1, {DIM}), "
                   f"(x, i) -> cast(x as double) * ({plane})), 0D, (s, v) -> s + v)")
            bit_terms.append(f"(case when {dot} >= 0 then {1 << j}L else 0L end)")
        table_sigs.append(" + ".join(bit_terms))
    stack = ", ".join(f"{t}L, ({sig})" for t, sig in enumerate(table_sigs))
    cols = ["cast(vec_id as long) as vec_id"]
    if with_embedding:
        cols.append("embedding")
    return emb.selectExpr(*cols, f"stack({n_tables}, {stack}) as (tbl, bucket)")


def embed_neardup(emb: DataFrame, threshold: float = 0.4,
                  n_planes: int = 32, n_tables: int = 8,
                  bucket_cap: int = 4096) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates from OR-amplified
    LSH tables (any table co-buckets the pair), verified by exact cosine ≥
    threshold. The all-pairs O(N²) never materializes — the one shuffle is
    the per-table bucket self-join, and `bucket_cap` drops degenerate
    buckets (mirroring the MinHash guard) so pair output is bounded by
    cap² per bucket at any corpus size."""
    bits = n_planes // n_tables
    sig = lsh_tables_signature(emb, n_tables, bits)
    if bucket_cap is not None:
        ok = (sig.groupBy("tbl", "bucket").count()
              .where(F.col("count") <= bucket_cap).drop("count"))
        sig = sig.join(ok, ["tbl", "bucket"])
    a, b = sig.alias("a"), sig.alias("b")
    pairs = (a.join(b, ["tbl", "bucket"])
             .where(F.col("a.vec_id") < F.col("b.vec_id"))
             .select(F.col("a.vec_id").alias("id_a"),
                     F.col("b.vec_id").alias("id_b"))
             .distinct())
    ea = emb.select(F.col("vec_id").cast("long").alias("id_a"),
                    F.col("embedding").alias("emb_a"))
    eb = emb.select(F.col("vec_id").cast("long").alias("id_b"),
                    F.col("embedding").alias("emb_b"))
    return (pairs.join(ea, "id_a").join(eb, "id_b")
            .withColumn("cosine", F.round(F.expr(_cosine_expr("emb_a", "emb_b")), 4))
            .where(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


def lsh_topk(emb: DataFrame, k: int = 5, n_queries: int = 20,
             n_planes: int = N_PLANES, multi_probe: bool | int = False,
             n_tables: int = 1) -> DataFrame:
    """ANN: exact cosine, but only within matching LSH buckets.

    Two recall knobs on top of the single-table default (which is the
    oracle-checked baseline):
      * `multi_probe=r` — probe every bucket within Hamming distance r of
        each query's signature (multi-probe LSH, Lv et al. VLDB'07;
        `True` = radius 1). The query side fans out ×Σ C(bits,i); it
        stays broadcast. The corpus-side plan is unchanged — probing is
        free of any corpus re-hash, which is why radius 2 is the right
        robustness lever: per-table match probability rises from
        p^b + b·p^(b-1)q to + C(b,2)·p^(b-2)q², enough to keep recall@k
        comfortably above 0.9 as the corpus (and with it the cosine of
        the true top-k) shifts, at ~2× candidate volume.
      * `n_tables=L` — OR-amplification: L independent tables of
        n_planes//L bits each; a pair is a candidate if ANY table buckets
        them together (recall 1-(1-p^b)^L instead of p^b). Corpus is
        hashed L times (the classic LSH memory trade), joined bucket-equal
        per table — still a linear, shuffle-bounded plan at any scale.
    """
    bits = n_planes // n_tables
    radius = int(multi_probe) if multi_probe is not True else 1
    # embedding rides the signature generator — no corpus-wide re-join
    # just to re-attach it; the bucket join below stays the only shuffle
    sig = lsh_tables_signature(emb, n_tables, bits, with_embedding=True)
    embs = sig.select(F.col("vec_id").alias("vid"), "embedding",
                      "tbl", "bucket")
    q = embs.where(F.col("vid") < n_queries).select(
        F.col("vid").alias("query_id"), F.col("embedding").alias("q_emb"),
        F.col("tbl").alias("q_tbl"), F.col("bucket").alias("q_bucket"))
    if radius:
        from itertools import combinations

        masks = [0] + [sum(1 << j for j in c)
                       for r in range(1, radius + 1)
                       for c in combinations(range(bits), r)]
        probes = F.array(*[F.col("q_bucket").bitwiseXOR(F.lit(m))
                           for m in masks])
        q = q.withColumn("q_bucket", F.explode(probes))
    cand = embs.join(
        F.broadcast(q),
        (F.col("tbl") == F.col("q_tbl")) & (F.col("bucket") == F.col("q_bucket"))
        & (F.col("vid") != F.col("query_id")))
    if radius or n_tables > 1:
        # a corpus vector can match several probes/tables of one query;
        # dedupe the (query, candidate) pair before scoring (single-probe
        # single-table pairs are already unique — no shuffle there)
        cand = cand.dropDuplicates(["query_id", "vid"])
    cand = cand.withColumn("cos", F.expr(_cosine_expr("q_emb", "embedding")))
    w = Window.partitionBy("query_id").orderBy(F.round(F.col("cos"), 6).desc(), F.col("vid").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", F.col("vid").alias("neighbor_id"),
                    F.round("cos", 4).alias("cosine"), "rank"))


def _centroid_sql(c: list) -> str:
    return "array(" + ", ".join(f"{float(v)}D" for v in c) + ")"


def _dot_expr(a: str, b: str) -> str:
    return (f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * y), "
            f"0D, (s, v) -> s + v)")


_NORM_EXPR = "sqrt(aggregate(embedding, 0D, (s, v) -> s + cast(v as double) * v))"


def _cent_sims_expr(centroids: list) -> str:
    """array(sim_0..sim_{nlist-1}) against broadcast LITERAL centroids;
    expects a precomputed `_nrm` column (the row vector's L2 norm,
    _NORM_EXPR). Centroid norms fold to Python constants so each sim
    embeds its centroid literal exactly ONCE (inside the dot): computing
    the norms in SQL — especially through nullif, whose CASE expansion
    duplicates its argument — tripled the expression tree per centroid
    and OOM'd the Catalyst driver on a 32-centroid quantizer."""
    import math

    terms = []
    for c in centroids:
        cn = math.sqrt(sum(float(v) * float(v) for v in c))
        if cn == 0.0:
            terms.append("cast(null as double)")
        else:
            terms.append(f"({_dot_expr('embedding', _centroid_sql(c))}"
                         f" / (nullif(_nrm, 0D) * {cn!r}D))")
    return "array(" + ", ".join(terms) + ")"


def train_ivf_centroids(emb: DataFrame, nlist: int = 16, *,
                        train_cap: int = 4096, iters: int = 1) -> list:
    """Deterministic IVF coarse quantizer (the k-means of a classic IVF
    index, trained the way production ANN systems train it — on a SAMPLE,
    never the full corpus):

    * seeds: the `nlist` stride-picked vectors (vec_id multiples of
      max_id//nlist) — a pure function of the data, no RNG;
    * training sample: rows with xxhash64(vec_id) in the lowest 1/s band,
      s sized so ~train_cap rows survive — value-hash selection, so any
      re-execution sees the same sample;
    * `iters` Lloyd steps: assign sample to nearest centroid (cosine, a
      per-row expression against broadcast literal centroids), recompute
      each cell's mean via posexplode + groupBy(cell, dim) — a shuffle of
      sample_rows × DIM scalar rows, bounded by train_cap, never corpus
      size. Empty cells keep their previous centroid.

    Returns nlist centroids as Python lists (metadata-scale: nlist × DIM
    floats), ready to broadcast into assignment expressions.
    """
    mx = emb.agg(F.max("vec_id")).collect()[0][0]
    if mx is None:
        raise ValueError("empty embeddings table")
    stride = max(1, int(mx) // nlist)
    seeds = (emb.where((F.col("vec_id") % stride == 0)
                       & (F.col("vec_id") / stride < nlist))
             .orderBy("vec_id").select("embedding").collect())
    cents = [list(r["embedding"]) for r in seeds[:nlist]]
    if len(cents) < nlist:
        # stride seeding assumes vec_id is dense from 0; on offset or
        # sparse id spaces it can miss every multiple and silently yield
        # an empty quantizer. Top up with a value-hash draw: per xxhash64
        # bucket, the row minimizing (hash, vec_id) — deterministic, one
        # aggregation, ≤nlist rows collected.
        extra = (emb.groupBy(F.pmod(F.xxhash64("vec_id"),
                                    F.lit(nlist)).alias("_hb"))
                 .agg(F.expr(
                     "min_by(embedding, struct(xxhash64(vec_id), vec_id))")
                     .alias("_e"))
                 .orderBy("_hb").select("_e").collect())
        seen = {tuple(c) for c in cents}
        for r in extra:
            v = list(r["_e"])
            if tuple(v) not in seen:
                cents.append(v)
                seen.add(tuple(v))
            if len(cents) >= nlist:
                break
    if not cents:
        raise ValueError("train_ivf_centroids: no seed vectors collected")

    n = emb.count()
    band = max(1, n // max(1, train_cap))
    train = emb.where(F.pmod(F.xxhash64("vec_id"), F.lit(band)) == 0)
    for _ in range(max(0, iters)):
        assigned = (train
                    .withColumn("_nrm", F.expr(_NORM_EXPR))
                    .withColumn("_sims", F.expr(_cent_sims_expr(cents)))
                    .withColumn("cell", F.expr(
                        "array_position(_sims, array_max(_sims))") - 1)
                    # zero-norm embeddings have NULL sims (the nullif
                    # DIVIDE_BY_ZERO guard) → NULL cell; they carry no
                    # direction, so drop them from training rather than
                    # crash int(None) in the means loop
                    .where(F.col("cell").isNotNull())
                    .select("cell", F.posexplode("embedding")
                            .alias("dim", "v")))
        means = (assigned.groupBy("cell", "dim")
                 .agg(F.avg("v").alias("m")).collect())
        by_cell: dict = {}
        for r in means:
            by_cell.setdefault(int(r["cell"]), {})[int(r["dim"])] = r["m"]
        cents = [[by_cell[c][d] for d in range(len(cents[0]))]
                 if c in by_cell else cents[c]
                 for c in range(len(cents))]
    return cents


def ivf_topk(emb: DataFrame, k: int = 5, n_queries: int = 20, *,
             nlist: int = 16, nprobe: int = 4,
             centroids: list | None = None) -> DataFrame:
    """IVF ANN (the second scale path beside LSH, per the brief): a coarse
    quantizer assigns every corpus vector to its nearest-centroid CELL
    (one per-row expression against broadcast literal centroids — linear,
    no shuffle beyond the final candidate join); each query probes its
    `nprobe` nearest cells and ranks exact cosine within them. At 10^9
    vectors the cell-equality join visits ~nprobe/nlist of the corpus per
    query instead of all of it — the IVF recall/speed trade. Deterministic
    end-to-end (quantizer seeds/sample/means are pure functions of the
    data), so repeated runs return identical rows."""
    if centroids is None:
        centroids = train_ivf_centroids(emb, nlist)
    nlist = len(centroids)
    cells = (emb.selectExpr("cast(vec_id as long) as vid", "embedding",
                            f"{_NORM_EXPR} as _nrm")
             .withColumn("_sims", F.expr(_cent_sims_expr(centroids)))
             .withColumn("cell", F.expr(
                 "array_position(_sims, array_max(_sims))").cast("int") - 1))
    corpus = cells.select("vid", "embedding", "cell")
    probes = F.expr(
        "transform(slice(array_sort(zip_with(_sims, "
        f"sequence(0, {nlist - 1}), "
        "(s, i) -> struct(-s as negs, i as i))), "
        f"1, {int(nprobe)}), x -> cast(x.i as int))")
    q = (cells.where(F.col("vid") < n_queries)
         .select(F.col("vid").alias("query_id"),
                 F.col("embedding").alias("q_emb"),
                 F.explode(probes).alias("q_cell")))
    cand = corpus.join(
        F.broadcast(q),
        (F.col("cell") == F.col("q_cell"))
        & (F.col("vid") != F.col("query_id")))
    cand = cand.withColumn("cos", F.expr(_cosine_expr("q_emb", "embedding")))
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cos"), 6).desc(), F.col("vid").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", F.col("vid").alias("neighbor_id"),
                    F.round("cos", 4).alias("cosine"), "rank"))
