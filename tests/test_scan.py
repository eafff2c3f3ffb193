"""Compound-predicate scan (engine.scan): conjunction decomposed into
row-group prunes per conjunct + page-level skip on the driving column +
exact residual filter — the combined ColumnIndex+OffsetIndex pruning of
the reference (writer/writer.go:418-481, reader/columnbuffer.go:158-230)
behind one filter surface."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def scan_enc(spark):
    """Range-clustered 3-column table: k sorted (pruning bites), price
    correlated, tag low-cardinality string with distinct + bloom stats."""
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.types import to_arrow_schema

    from tokenc.engine import encode_df
    from tokenc.schema import specs_from_arrow_schema

    n = 40_000
    df = (spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 1000).cast("double").alias("price"),
        F.concat(F.lit("t"), (F.col("id") % 7).cast("string")).alias("tag"))
        .repartitionByRange(8, "k").sortWithinPartitions("k"))
    schema = to_arrow_schema(df.schema)
    specs = specs_from_arrow_schema(schema, bloom_columns=["tag"],
                                    distinct_columns=["tag"])
    enc = encode_df(df, specs, target_raw_bytes=64 << 10).cache()
    enc.count()
    return enc, specs, schema


def _expected(filters_fn, n=40_000):
    k = np.arange(n)
    price = (k % 1000).astype(float)
    tag = np.array([f"t{i % 7}" for i in range(n)])
    m = filters_fn(k, price, tag)
    return pd.DataFrame({"k": k[m], "price": price[m], "tag": tag[m]})


def _run(spark, scan_enc, filters, **kw):
    from tokenc.engine import scan

    enc, specs, schema = scan_enc
    out = scan(enc, specs, schema, filters, **kw)
    return out.orderBy("k").toPandas()


class TestCompoundScan:
    def test_two_column_conjunction(self, spark, scan_enc):
        got = _run(spark, scan_enc,
                   [("k", "between", (5000, 9000)), ("price", "<=", 300.0)])
        want = _expected(lambda k, p, t: (k >= 5000) & (k <= 9000) & (p <= 300))
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))

    def test_range_eq_and_in(self, spark, scan_enc):
        got = _run(spark, scan_enc,
                   [("k", ">=", 30000), ("tag", "=", "t3")])
        want = _expected(lambda k, p, t: (k >= 30000) & (t == "t3"))
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))

        got = _run(spark, scan_enc,
                   [("k", "<", 2000), ("tag", "in", ["t0", "t5"])])
        want = _expected(lambda k, p, t: (k < 2000) & np.isin(t, ["t0", "t5"]))
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))

    def test_rowgroups_pruned_before_decode(self, spark, scan_enc):
        from tokenc.engine import prune_rowgroups

        enc, specs, schema = scan_enc
        total = enc.count()
        kept = prune_rowgroups(enc, "k", 5000, 9000).count()
        assert kept < total / 2, (kept, total)

    def test_string_range_driving_column(self, spark, scan_enc):
        got = _run(spark, scan_enc,
                   [("tag", "between", ("t2", "t4")), ("k", "<=", 100)],
                   page_column="k")
        want = _expected(lambda k, p, t: (t >= "t2") & (t <= "t4") & (k <= 100))
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))

    def test_empty_result(self, spark, scan_enc):
        got = _run(spark, scan_enc, [("k", ">", 10 ** 9)])
        assert got.empty

    def test_index_backed_scan_matches(self, spark, scan_enc):
        from tokenc.sorted_index import SortedKeyIndex

        enc, specs, schema = scan_enc
        idx = SortedKeyIndex.build(enc, "k")
        assert idx.clustered
        got = _run(spark, scan_enc,
                   [("k", "between", (5000, 9000)), ("price", "<=", 300.0)],
                   indexes={"k": idx})
        want = _expected(lambda k, p, t: (k >= 5000) & (k <= 9000) & (p <= 300))
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))
        # the index probe touched O(log n + matches) bounds, not all groups
        assert idx.last_probes < len(idx.rg_ids)

    def test_strict_ops_residual(self, spark, scan_enc):
        got = _run(spark, scan_enc, [("k", ">", 39998), ("price", "<", 1000.0)])
        want = _expected(lambda k, p, t: (k > 39998) & (p < 1000))
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))


class TestScanEdges:
    def test_no_filters_decodes_everything(self, spark, scan_enc):
        from tokenc.engine import scan

        enc, specs, schema = scan_enc
        assert scan(enc, specs, schema, []).count() == 40_000

    def test_unknown_column_raises(self, spark, scan_enc):
        from tokenc.engine import scan

        enc, specs, schema = scan_enc
        with pytest.raises(KeyError):
            scan(enc, specs, schema, [("nope", ">=", 1)])

    def test_nullable_column_falls_back_exactly(self, spark):
        # nulls disable the page directory → full decode + residual; the
        # result must still be exact
        from pyspark.sql import functions as F
        from pyspark.sql.pandas.types import to_arrow_schema

        from tokenc.engine import encode_df, scan
        from tokenc.schema import specs_from_arrow_schema

        df = spark.range(5000).select(
            F.col("id").alias("k"),
            F.when(F.col("id") % 7 == 0, None)
             .otherwise(F.col("id") % 100).alias("v"))
        schema = to_arrow_schema(df.schema)
        specs = specs_from_arrow_schema(schema)
        enc = encode_df(df, specs, target_raw_bytes=16 << 10)
        got = (scan(enc, specs, schema, [("v", "between", (10, 20))])
               .orderBy("k").toPandas())
        assert got["v"].between(10, 20).all()
        assert len(got) == sum(1 for i in range(5000)
                               if i % 7 != 0 and 10 <= i % 100 <= 20)

    def test_bytes_eq_probe_never_false_prunes(self, spark, scan_enc):
        # regression: a bytes '=' literal was str()-coerced ("b'R'") in
        # the distinct-set prune and silently dropped every row group
        got = _run(spark, scan_enc, [("tag", "=", b"t3"), ("k", "<", 700)])
        want = _expected(lambda k, p, t: (t == "t3") & (k < 700))
        assert got["k"].tolist() == want["k"].tolist()

    def test_date_bounds_fall_back_exactly(self, spark):
        # regression: a date literal as the driving bound reached the
        # numeric page comparison and raised TypeError in the executor;
        # and a date '=' crashed prune_rowgroups_eq's float() widening.
        # Both must fall back to decode + residual, exactly.
        import datetime

        from pyspark.sql import functions as F
        from pyspark.sql.pandas.types import to_arrow_schema

        from tokenc.engine import encode_df, scan
        from tokenc.schema import specs_from_arrow_schema

        df = spark.range(1000).select(
            F.col("id").alias("k"),
            F.date_add(F.lit("2020-01-01"), F.col("id").cast("int"))
            .alias("d"))
        schema = to_arrow_schema(df.schema)
        specs = specs_from_arrow_schema(schema, bloom_columns=["d"])
        enc = encode_df(df, specs, target_raw_bytes=8 << 10)
        lo, hi = datetime.date(2020, 2, 1), datetime.date(2020, 2, 10)
        got = (scan(enc, specs, schema, [("d", "between", (lo, hi))])
               .orderBy("k").toPandas())
        assert len(got) == 10 and got["d"].min() == lo
        eq = (scan(enc, specs, schema, [("d", "=", lo)])
              .orderBy("k").toPandas())
        assert len(eq) == 1

    def test_random_conjunctions_property(self, spark, scan_enc):
        import random

        from tokenc.engine import scan

        enc, specs, schema = scan_enc
        rng = random.Random(13)
        for _ in range(6):
            lo = rng.randrange(0, 39_000)
            hi = lo + rng.randrange(1, 4000)
            pl = float(rng.randrange(0, 1000))
            tag = f"t{rng.randrange(7)}"
            got = (scan(enc, specs, schema,
                        [("k", "between", (lo, hi)), ("price", "<=", pl),
                         ("tag", "=", tag)]).orderBy("k").toPandas())
            want = _expected(lambda k, p, t: (k >= lo) & (k <= hi)
                             & (p <= pl) & (t == tag))
            assert got["k"].tolist() == want["k"].tolist()
            assert got["price"].tolist() == want["price"].tolist()
