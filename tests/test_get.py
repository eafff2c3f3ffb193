"""Point-fetch API (engine.get) and auto-wired sorted indexes: the
reference's SkipRows+ReadByNumber analog (reader/reader.go:179-253)
composed from sorted-index probe → dict/bloom confirm → page-directory
row runs → exact residual; scan() builds-and-memoizes the index itself
when the manifest's sorted flags say the layout is clustered."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def kv_enc(spark):
    """Range-clustered (k, payload, tag) with bloom + distinct on k."""
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.types import to_arrow_schema

    from tokenc.engine import encode_df
    from tokenc.schema import specs_from_arrow_schema

    n = 30_000
    df = (spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 3 + 1).cast("double").alias("payload"),
        F.concat(F.lit("v"), (F.col("id") % 5).cast("string")).alias("tag"))
        .repartitionByRange(8, "k").sortWithinPartitions("k"))
    schema = to_arrow_schema(df.schema)
    specs = specs_from_arrow_schema(schema, bloom_columns=["k"])
    enc = encode_df(df, specs, target_raw_bytes=32 << 10).cache()
    enc.count()
    return enc, specs, schema


def _want(keys):
    ks = sorted(keys)
    return pd.DataFrame({
        "k": ks,
        "payload": [float(k * 3 + 1) for k in ks],
        "tag": [f"v{k % 5}" for k in ks]})


class TestGet:
    def test_scattered_point_fetch(self, spark, kv_enc):
        from tokenc.engine import get

        enc, specs, schema = kv_enc
        keys = [3, 4444, 12001, 29999]
        got = get(enc, specs, schema, "k", keys).orderBy("k").toPandas()
        pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                      _want(keys))

    def test_absent_keys_empty(self, spark, kv_enc):
        from tokenc.engine import get

        enc, specs, schema = kv_enc
        assert get(enc, specs, schema, "k", [-5, 10 ** 9]).count() == 0

    def test_mixed_present_absent(self, spark, kv_enc):
        from tokenc.engine import get

        enc, specs, schema = kv_enc
        got = get(enc, specs, schema, "k", [77, -1, 20000]) \
            .orderBy("k").toPandas()
        pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                      _want([77, 20000]))

    def test_probe_touches_few_groups(self, spark, kv_enc):
        """The point of get(): candidate row groups ≪ manifest size."""
        from tokenc.engine import sorted_index_for

        enc, specs, schema = kv_enc
        idx = sorted_index_for(enc, "k")
        assert idx is not None and idx.clustered
        total = len(idx.rg_ids) + len(idx.no_stats_ids)
        keys = [3, 4444, 12001, 29999]
        cand = {i for v in keys for i in idx.lookup(v)}
        assert total >= 16
        assert len(cand) <= len(keys) + len(idx.no_stats_ids)
        assert len(cand) < total / 2

    def test_string_key_fetch(self, spark):
        from pyspark.sql import functions as F
        from pyspark.sql.pandas.types import to_arrow_schema

        from tokenc.engine import encode_df, get
        from tokenc.schema import specs_from_arrow_schema

        df = (spark.range(5000).select(
            F.format_string("key%06d", F.col("id")).alias("k"),
            F.col("id").alias("v"))
            .repartitionByRange(4, "k").sortWithinPartitions("k"))
        schema = to_arrow_schema(df.schema)
        specs = specs_from_arrow_schema(schema, bloom_columns=["k"])
        enc = encode_df(df, specs, target_raw_bytes=16 << 10).cache()
        got = get(enc, specs, schema, "k",
                  ["key000123", "key004999", "nope"]).orderBy("k").toPandas()
        assert got["k"].tolist() == ["key000123", "key004999"]
        assert got["v"].tolist() == [123, 4999]

    def test_unclustered_layout_still_exact(self, spark):
        """Hash-shuffled keys: every group spans the id range, the index
        probe is unselective, bloom + residual still make it exact."""
        from pyspark.sql import functions as F
        from pyspark.sql.pandas.types import to_arrow_schema

        from tokenc.engine import encode_df, get
        from tokenc.schema import specs_from_arrow_schema

        df = (spark.range(8000).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("v"))
            .repartition(4, F.hash("id")))
        schema = to_arrow_schema(df.schema)
        specs = specs_from_arrow_schema(schema, bloom_columns=["k"])
        enc = encode_df(df, specs, target_raw_bytes=16 << 10).cache()
        got = get(enc, specs, schema, "k", [17, 6021]).orderBy("k").toPandas()
        assert got["k"].tolist() == [17, 6021]
        assert got["v"].tolist() == [17 % 97, 6021 % 97]

    def test_unknown_key_column_raises(self, spark, kv_enc):
        from tokenc.engine import get

        enc, specs, schema = kv_enc
        with pytest.raises(KeyError):
            get(enc, specs, schema, "nope", [1])


class TestAutoIndex:
    def test_index_memoized_across_scans(self, spark, monkeypatch):
        """scan() builds the sorted index once per (handle, column) and
        reuses it — the second scan must not collect the manifest again."""
        from pyspark.sql import functions as F
        from pyspark.sql.pandas.types import to_arrow_schema

        import tokenc.engine as eng
        from tokenc.schema import specs_from_arrow_schema
        from tokenc.sorted_index import SortedKeyIndex

        df = (spark.range(20_000).select(
            F.col("id").alias("k"), (F.col("id") % 10).alias("v"))
            .repartitionByRange(4, "k").sortWithinPartitions("k"))
        schema = to_arrow_schema(df.schema)
        specs = specs_from_arrow_schema(schema)
        enc = eng.encode_df(df, specs, target_raw_bytes=16 << 10).cache()
        enc.count()

        calls = []
        real_build = SortedKeyIndex.build.__func__

        def counting_build(cls, enc_df, column):
            calls.append(column)
            return real_build(cls, enc_df, column)

        monkeypatch.setattr(SortedKeyIndex, "build",
                            classmethod(counting_build))
        r1 = eng.scan(enc, specs, schema, [("k", "between", (100, 200))])
        r2 = eng.scan(enc, specs, schema, [("k", "between", (5000, 5100))])
        assert r1.count() == 101 and r2.count() == 101
        assert calls.count("k") == 1, calls

    def test_uncached_frame_never_auto_indexes(self, spark, monkeypatch):
        """Regression (r5): an UNPERSISTED encode whose lineage contains
        repartitionByRange re-samples range boundaries per action, so
        content-hash rg_ids differ between an index-build action and the
        scan action — an rg_id IN-list from one must never filter the
        other. Auto-indexing must skip unpersisted frames entirely (the
        single-action stats prunes stay correct) and the scan result must
        be exact. (_is_persisted goes through df.storageLevel, which asks
        Spark's cacheManager by canonicalized PLAN equality — so the plan
        here must not collide with a frame another test cached, hence the
        odd row count.)"""
        from pyspark.sql import functions as F
        from pyspark.sql.pandas.types import to_arrow_schema

        import tokenc.engine as eng
        from tokenc.schema import specs_from_arrow_schema
        from tokenc.sorted_index import SortedKeyIndex

        df = (spark.range(21_001).select(
            F.col("id").alias("k"), (F.col("id") % 11).alias("v"))
            .repartitionByRange(4, "k").sortWithinPartitions("k"))
        schema = to_arrow_schema(df.schema)
        specs = specs_from_arrow_schema(schema)
        enc = eng.encode_df(df, specs, target_raw_bytes=16 << 10)  # no cache

        calls = []
        real_build = SortedKeyIndex.build.__func__

        def counting_build(cls, enc_df, column):
            calls.append(column)
            return real_build(cls, enc_df, column)

        monkeypatch.setattr(SortedKeyIndex, "build",
                            classmethod(counting_build))
        out = eng.scan(enc, specs, schema, [("k", "between", (100, 200))])
        assert out.count() == 101
        assert calls == [], "auto-index must not build on unpersisted frames"
        got = eng.get(enc, specs, schema, "k", [5, 19999]) \
            .orderBy("k").toPandas()
        assert got["k"].tolist() == [5, 19999]
        assert calls == []

    def test_auto_index_prunes_clustered_scan(self, spark, kv_enc):
        """Result parity: auto-indexed scan == auto_index=False scan."""
        from tokenc.engine import scan

        enc, specs, schema = kv_enc
        filt = [("k", "between", (1000, 1500))]
        a = scan(enc, specs, schema, filt).orderBy("k").toPandas()
        b = scan(enc, specs, schema, filt,
                 auto_index=False).orderBy("k").toPandas()
        pd.testing.assert_frame_equal(a, b)
        assert len(a) == 501

    def test_stale_materialization_token_rebuilds(self, spark, monkeypatch):
        """Regression (r5 review): the memo is keyed on the DataFrame
        HANDLE, but an unpersist + re-cache re-materializes the lineage
        with different content-hash rg_ids — a stale index's IN-list
        would silently match zero row groups. Every reuse re-checks a
        1-row materialization fingerprint; a mismatch must rebuild."""
        from pyspark.sql import functions as F
        from pyspark.sql.pandas.types import to_arrow_schema

        import tokenc.engine as eng
        from tokenc.schema import specs_from_arrow_schema
        from tokenc.sorted_index import SortedKeyIndex

        df = (spark.range(22_000).select(
            F.col("id").alias("k"), (F.col("id") % 13).alias("v"))
            .repartitionByRange(4, "k").sortWithinPartitions("k"))
        schema = to_arrow_schema(df.schema)
        specs = specs_from_arrow_schema(schema)
        enc = eng.encode_df(df, specs, target_raw_bytes=16 << 10).cache()
        enc.count()

        calls = []
        real_build = SortedKeyIndex.build.__func__

        def counting_build(cls, enc_df, column):
            calls.append(column)
            return real_build(cls, enc_df, column)

        monkeypatch.setattr(SortedKeyIndex, "build",
                            classmethod(counting_build))
        assert eng.scan(enc, specs, schema,
                        [("k", "between", (100, 200))]).count() == 101
        assert calls.count("k") == 1
        # simulate a re-materialized handle: the memo entry's fingerprint
        # no longer matches what the aggregate sees
        tok, state, idx = eng._sorted_indexes[enc]["k"]
        eng._sorted_indexes[enc]["k"] = ((-1, "gone", "gone"), state, idx)
        assert eng.scan(enc, specs, schema,
                        [("k", "between", (100, 200))]).count() == 101
        assert calls.count("k") == 2, calls

    def test_unpersist_recache_scan_stays_exact(self, spark):
        """End-to-end guarantee behind the fingerprint: whatever rg_ids
        the re-materialization produced, a scan after unpersist+re-cache
        returns exact rows (never a silent empty result)."""
        from pyspark.sql import functions as F
        from pyspark.sql.pandas.types import to_arrow_schema

        import tokenc.engine as eng
        from tokenc.schema import specs_from_arrow_schema

        df = (spark.range(23_000).select(
            F.col("id").alias("k"), (F.col("id") % 17).alias("v"))
            .repartitionByRange(4, "k").sortWithinPartitions("k"))
        schema = to_arrow_schema(df.schema)
        specs = specs_from_arrow_schema(schema)
        enc = eng.encode_df(df, specs, target_raw_bytes=16 << 10).cache()
        enc.count()
        filt = [("k", "between", (700, 900))]
        assert eng.scan(enc, specs, schema, filt).count() == 201
        enc.unpersist()
        enc.cache()
        enc.count()
        assert eng.scan(enc, specs, schema, filt).count() == 201

    def test_unsorted_layout_skips_index_build(self, spark, monkeypatch):
        """Regression (r5 review): scan() only uses CLUSTERED indexes, so
        an unsorted layout must not pay the full-manifest collect + sort
        just to discard the result — the 1-row all-sorted pre-check skips
        it. get() on the same frame still builds (overlap-tolerant probe
        is useful for point lookups on any layout)."""
        from pyspark.sql import functions as F
        from pyspark.sql.pandas.types import to_arrow_schema

        import tokenc.engine as eng
        from tokenc.schema import specs_from_arrow_schema
        from tokenc.sorted_index import SortedKeyIndex

        # (id*37) % 9000 is a bijection that scrambles row order, so the
        # chunks really are internally UNsorted (a plain hash repartition
        # of spark.range still hands each reducer its ids ascending)
        df = (spark.range(9_000).select(
            ((F.col("id") * 37) % 9000).alias("k"),
            (F.col("id") % 7).alias("v"))
            .repartition(4, F.hash("id")))
        schema = to_arrow_schema(df.schema)
        specs = specs_from_arrow_schema(schema)
        enc = eng.encode_df(df, specs, target_raw_bytes=16 << 10).cache()
        enc.count()

        calls = []
        real_build = SortedKeyIndex.build.__func__

        def counting_build(cls, enc_df, column):
            calls.append(column)
            return real_build(cls, enc_df, column)

        monkeypatch.setattr(SortedKeyIndex, "build",
                            classmethod(counting_build))
        assert eng.scan(enc, specs, schema,
                        [("k", "between", (100, 200))]).count() == 101
        assert calls == [], "clustered-only caller must skip the build"
        got = eng.get(enc, specs, schema, "k", [42]).toPandas()
        assert got["k"].tolist() == [42]
        assert calls == ["k"], "point fetch builds the index after a skip"
