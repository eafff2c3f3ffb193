"""Pipeline + skew + manifest + multimodal tests (Spark where needed)."""

from __future__ import annotations

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


class TestSkew:
    def test_split_reassemble_roundtrip(self, spark):
        from pyspark.sql import functions as F

        from tokenc.datagen import synth_tokens_df
        from tokenc.skew import reassemble_docs, split_long_docs

        src = synth_tokens_df(spark, 500, seed=5, mean_tokens=300, partitions=2).cache()
        split = split_long_docs(src, max_tokens=256).cache()
        assert split.agg(F.max("n_tok")).collect()[0][0] <= 256
        assert split.count() > src.count()  # giants actually split
        back = reassemble_docs(split)
        a = src.orderBy("doc_id").toPandas()
        b = back.orderBy("doc_id").toPandas()
        assert len(a) == len(b)
        for x, y in zip(a["tokens"].values, b["tokens"].values):
            np.testing.assert_array_equal(x, y)
        assert (a["n_tok"].values == b["n_tok"].values).all()
        assert (a["source"].values == b["source"].values).all()

    def test_split_preserves_small_docs(self, spark):
        from tokenc.datagen import synth_tokens_df
        from tokenc.skew import split_long_docs

        src = synth_tokens_df(spark, 200, seed=6, mean_tokens=50, partitions=2)
        split = split_long_docs(src, max_tokens=100_000)
        assert split.count() == 200  # nothing oversized → pure pass-through


class TestDedup:
    def test_exact_dedup_counts(self, spark):
        from tokenc.pipeline.dedup import exact_dedup

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        out = exact_dedup(docs).toPandas()
        assert out["dup_count"].sum() == docs.count()
        assert (out["dup_count"] >= 1).all()

    def test_minhash_finds_planted_dups(self, spark):
        from pyspark.sql import functions as F

        from tokenc.pipeline.dedup import minhash_neardup

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50).cache()
        # plant a NEAR-dup (exact clones collapse into one representative):
        # doc 0's text with two words appended
        clone = (docs.where(F.col("doc_id") == 0)
                 .withColumn("doc_id", F.lit(9999))
                 .withColumn("text", F.concat(F.col("text"), F.lit(" trailing addendum"))))
        with_dup = docs.unionByName(clone)
        pairs = minhash_neardup(with_dup, threshold=0.6).toPandas()
        assert ((pairs["id_a"] == 0) & (pairs["id_b"] == 9999)).any()

    def test_minhash_degenerate_identical_bucket(self, spark):
        """10k byte-identical docs — the web-corpus boilerplate case — must
        collapse to one representative: no pair explosion, fast completion."""
        from pyspark.sql import functions as F

        from tokenc.pipeline.dedup import exact_dedup, minhash_neardup

        docs = (spark.range(10_000)
                .select(F.col("id").alias("doc_id"),
                        F.lit("the same boilerplate text repeated on every "
                              "single page of this website forever").alias("text")))
        pairs = minhash_neardup(docs, threshold=0.5).toPandas()
        assert len(pairs) == 0  # one representative → no candidate pairs
        ex = exact_dedup(docs).toPandas()
        assert len(ex) == 1 and int(ex["dup_count"].iloc[0]) == 10_000

    def test_minhash_bucket_cap_drops_wide_buckets(self, spark):
        """Distinct texts whose word-id hashes collide (word_id keys on
        length/first/last only: cat≡cot≡cut) share every band bucket; with
        bucket_cap below the bucket width the pairs are dropped, with a
        generous cap they all verify at jaccard 1.0."""
        from tokenc.pipeline.dedup import minhash_candidates

        base = "the {} sat on the mat and looked out of the window quietly"
        rows = [(i, base.format(w)) for i, w in
                enumerate(["cat", "cot", "cut", "cit", "czt"])]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        wide = minhash_candidates(docs, bucket_cap=None).toPandas()
        assert len(wide) == 10  # all 5C2 pairs — identical shingle sets
        capped = minhash_candidates(docs, bucket_cap=3).toPandas()
        assert len(capped) == 0  # every bucket has 5 > 3 members → dropped

    def test_simhash_similar_docs_close(self, spark):
        from pyspark.sql import functions as F

        from tokenc.pipeline.dedup import simhash

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20).cache()
        clone = docs.where(F.col("doc_id") == 1).withColumn("doc_id", F.lit(8888))
        out = simhash(docs.unionByName(clone)).toPandas().set_index("doc_id")
        assert out.loc[1, "simhash"] == out.loc[8888, "simhash"]


class TestSimSearch:
    def test_brute_topk_sane(self, spark):
        from tokenc.pipeline.simsearch import brute_topk

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        out = brute_topk(emb, k=3, n_queries=5).toPandas()
        assert set(out["query_id"].unique()) == set(range(5))
        assert out.groupby("query_id")["rank"].max().eq(3).all()
        # cosine within [-1, 1]
        assert out["cosine"].between(-1.0001, 1.0001).all()

    def test_lsh_subset_of_brute_candidates(self, spark):
        from tokenc.pipeline.simsearch import brute_topk, lsh_topk

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        lsh = lsh_topk(emb, k=3, n_queries=5).toPandas()
        # ANN returns fewer-or-equal results, all with valid ranks
        assert (lsh["rank"] <= 3).all()

    def test_embed_neardup_pairs_verified(self, spark):
        """Embedding-cosine near-dup: every returned pair really has
        cosine >= threshold (exact check vs numpy), ids are ordered and
        distinct, and a generous-threshold run is a superset."""
        import numpy as np

        from tokenc.pipeline.simsearch import embed_neardup

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
        out = embed_neardup(emb, threshold=0.35).toPandas()
        assert (out["id_a"] < out["id_b"]).all()
        assert not out.duplicated(["id_a", "id_b"]).any()
        pdf = emb.toPandas().sort_values("vec_id")
        E = np.stack(pdf["embedding"].values).astype(np.float64)
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        for r in out.itertuples():
            cos = float(En[int(r.id_a)] @ En[int(r.id_b)])
            assert round(cos, 4) >= 0.35
        lower = embed_neardup(emb, threshold=0.3).toPandas()
        got = set(zip(out["id_a"], out["id_b"]))
        sup = set(zip(lower["id_a"], lower["id_b"]))
        assert got <= sup
        emb.unpersist()

    def test_multiprobe_lsh_recall(self, spark):
        """OR-amplified (8 tables × 4 bits) + Hamming-1 multi-probe must
        reach recall@5 ≥ 0.9 vs brute force on the fixture. The fixture's
        top-5 neighbors sit at cosine ≈ 0.32 (≈71°, per-bit agreement
        p ≈ 0.61), so a single 12-bit table caps out around p^12 ≈ 0.003 —
        amplification is the recall mechanism, probing halves the tables
        needed."""
        from tokenc.pipeline.simsearch import brute_topk, lsh_topk

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
        k, nq = 5, 20
        brute = brute_topk(emb, k=k, n_queries=nq).toPandas()
        truth = {(r.query_id, r.neighbor_id) for r in brute.itertuples()}
        single = lsh_topk(emb, k=k, n_queries=nq).toPandas()
        got1 = {(r.query_id, r.neighbor_id) for r in single.itertuples()}
        multi = lsh_topk(emb, k=k, n_queries=nq, n_planes=32, n_tables=8,
                         multi_probe=True).toPandas()
        got = {(r.query_id, r.neighbor_id) for r in multi.itertuples()}
        recall = len(truth & got) / len(truth)
        recall1 = len(truth & got1) / len(truth)
        assert recall >= 0.9, f"amplified multi-probe recall {recall:.2f}"
        assert recall > recall1  # amplification must actually lift recall
        emb.unpersist()


class TestMultimodal:
    def test_feature_extraction_plumbing(self, spark):
        from tokenc.pipeline.multimodal import extract_features, synth_media_df

        media = synth_media_df(spark, n=32)
        out = extract_features(media).toPandas()
        assert len(out) == 32
        assert all(len(f) == 16 for f in out["features"])
        assert (out["n_bytes"] > 0).all()
        # deterministic across runs
        out2 = extract_features(synth_media_df(spark, n=32)).toPandas()
        a = np.stack(out.sort_values("media_id")["features"].values)
        b = np.stack(out2.sort_values("media_id")["features"].values)
        np.testing.assert_array_equal(a, b)

    def test_features_are_real_decoded_sums(self, spark):
        """Features come from genuinely DECODED pixels/samples: recompute
        each strided sum from the ground-truth formulas and compare —
        a BGR swap, bottom-up flip, row-padding or chunk-walk bug in the
        decoders would shift every sum."""
        from tokenc.pipeline.multimodal import (_audio_samples,
                                                _image_pixels,
                                                extract_features, media_dims,
                                                synth_media_df)

        out = extract_features(synth_media_df(spark, n=16)) \
            .toPandas().sort_values("media_id").reset_index(drop=True)
        for i in range(16):
            w, h, ns = media_dims(i)
            flat = (_image_pixels(i, w, h).reshape(-1).astype(np.int64)
                    if i % 2 == 0 else _audio_samples(i, ns).astype(np.int64))
            pad = (-flat.size) % 16
            want = np.pad(flat, (0, pad)).reshape(-1, 16).sum(axis=0)
            np.testing.assert_array_equal(
                np.asarray(out.loc[i, "features"], dtype=np.int64), want)

    def test_payloads_are_real_files(self, spark):
        """Payload column holds genuine encoded bytes with the right
        magic, parseable by the standalone decoders."""
        from tokenc.pipeline.multimodal import decode_media, synth_media_df

        rows = synth_media_df(spark, n=8).collect()
        magics = {"ppm": b"P6", "bmp": b"BM", "wav": b"RIFF"}
        for r in rows:
            payload = bytes(r["payload"])
            assert payload.startswith(magics[r["fmt"]])
            assert decode_media(payload, r["fmt"]).size > 0


class TestManifestProtocol:
    def test_commit_marker_roundtrip(self, tmp_path):
        from tokenc import manifest as mf

        root = str(tmp_path)
        fp = mf.fingerprint_input({"x": 1})
        assert not mf.is_committed(root, 0, fp)
        mf.commit_slice(root, 0, fp, rows=10)
        assert mf.is_committed(root, 0, fp)
        assert not mf.is_committed(root, 0, mf.fingerprint_input({"x": 2}))
        assert not mf.is_committed(root, 1, fp)


class TestIvf:
    """IVF ANN (tokenc/pipeline/simsearch.py::ivf_topk): deterministic
    coarse quantizer (stride seeds + Lloyd step on a value-hash-capped
    sample) + probed-cell exact rerank — the brief's second ANN scale path
    beside LSH."""

    def test_deterministic_and_recall(self, spark):
        from tokenc.pipeline.simsearch import brute_topk, ivf_topk

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
        a = ivf_topk(emb, k=5, n_queries=20, nlist=32, nprobe=12).collect()
        b = ivf_topk(emb, k=5, n_queries=20, nlist=32, nprobe=12).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        truth = {(r["query_id"], r["neighbor_id"])
                 for r in brute_topk(emb, 5, 20).collect()}
        got = {(r["query_id"], r["neighbor_id"]) for r in a}
        assert len(got & truth) / len(truth) >= 0.75

    def test_quantizer_shape_and_plan(self, spark):
        from tokenc.pipeline.simsearch import (DIM, ivf_topk,
                                               train_ivf_centroids)

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        cents = train_ivf_centroids(emb, 8)
        assert len(cents) == 8 and all(len(c) == DIM for c in cents)
        plan = (ivf_topk(emb, 3, 5, nprobe=2, centroids=cents)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "Cartesian" not in plan and "NestedLoop" not in plan

    def test_probed_subset_ranks_valid(self, spark):
        from tokenc.pipeline.simsearch import ivf_topk

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        out = ivf_topk(emb, k=3, n_queries=5, nlist=8, nprobe=2).toPandas()
        assert (out["rank"] <= 3).all()
        assert out["cosine"].between(-1.0001, 1.0001).all()
        assert (out.groupby("query_id")["neighbor_id"].nunique()
                == out.groupby("query_id").size()).all()
