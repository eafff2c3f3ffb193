"""Boundary-order binary search (tokenc/sorted_index.py): point lookups
and ranges probe O(log n + matches) row-group bounds, not all n — the
ColumnIndex boundary_order analog (reference writer/writer.go:418-481)."""

from __future__ import annotations

import json
import math

import pytest


def _fake_manifest(spark, n_groups: int, rows_per_group: int = 100):
    """Manifest-shaped DF: n_groups disjoint ascending [min,max] ranges on
    column k — only the columns SortedKeyIndex.build touches."""
    from pyspark.sql import functions as F

    return spark.range(n_groups).select(
        F.concat(F.lit("rg"), F.col("id")).alias("rg_id"),
        F.struct(
            (F.col("id") * rows_per_group).cast("string").alias("min_json"),
            (F.col("id") * rows_per_group + rows_per_group - 1)
            .cast("string").alias("max_json"),
            F.lit(True).alias("sorted"),
        ).alias("k_meta"))


class TestSortedKeyIndexUnit:
    def test_point_lookup_log_probes_10k_groups(self, spark):
        from tokenc.sorted_index import SortedKeyIndex

        n = 10_000
        idx = SortedKeyIndex.build(_fake_manifest(spark, n), "k")
        assert idx.clustered
        bound = 2 * math.ceil(math.log2(n)) + 4
        for probe_val in (0, 55, 499_950, 999_999, 123_456):
            ids = idx.lookup(probe_val)
            assert ids == [f"rg{probe_val // 100}"]
            assert idx.last_probes <= bound, (probe_val, idx.last_probes)

    def test_range_probe_visits_only_matches(self, spark):
        from tokenc.sorted_index import SortedKeyIndex

        n = 10_000
        idx = SortedKeyIndex.build(_fake_manifest(spark, n), "k")
        ids = idx.probe(10_000, 10_999)  # groups 100..109
        assert ids == [f"rg{g}" for g in range(100, 110)]
        assert idx.last_probes <= 2 * math.ceil(math.log2(n)) + len(ids) + 4

    def test_out_of_range_probes(self, spark):
        from tokenc.sorted_index import SortedKeyIndex

        idx = SortedKeyIndex.build(_fake_manifest(spark, 1000), "k")
        assert idx.lookup(-5) == []
        assert idx.lookup(10 ** 9) == []
        assert idx.probe(None, 150) == ["rg0", "rg1"]
        assert idx.probe(99_850, None) == ["rg998", "rg999"]

    def test_overlapping_groups_still_complete(self, spark):
        from pyspark.sql import functions as F

        from tokenc.sorted_index import SortedKeyIndex

        # overlapping bounds (unsorted layout): completeness must hold
        df = spark.range(100).select(
            F.concat(F.lit("rg"), F.col("id")).alias("rg_id"),
            F.struct(
                (F.col("id") * 10).cast("string").alias("min_json"),
                (F.col("id") * 10 + 25).cast("string").alias("max_json"),
                F.lit(False).alias("sorted")).alias("k_meta"))
        idx = SortedKeyIndex.build(df, "k")
        assert not idx.clustered
        got = set(idx.lookup(205))
        want = {f"rg{g}" for g in range(100)
                if g * 10 <= 205 <= g * 10 + 25}
        assert got == want

    def test_nonfinite_float_stats_route_to_no_stats(self, spark):
        # regression: NaN/inf chunk stats serialize as the strings
        # "nan"/"inf" and mixed str/float entries broke the bound sort;
        # such chunks can hold anything → always returned
        from pyspark.sql import functions as F

        from tokenc.sorted_index import SortedKeyIndex

        df = spark.range(10).select(
            F.concat(F.lit("rg"), F.col("id")).alias("rg_id"),
            F.struct(
                F.when(F.col("id") == 3, F.lit('"nan"'))
                 .otherwise((F.col("id") * 10).cast("string"))
                 .alias("min_json"),
                F.when(F.col("id") == 3, F.lit('"nan"'))
                 .otherwise((F.col("id") * 10 + 9).cast("string"))
                 .alias("max_json"),
                F.lit(True).alias("sorted")).alias("k_meta"))
        idx = SortedKeyIndex.build(df, "k")
        assert set(idx.lookup(25)) == {"rg2", "rg3"}

    def test_no_stats_groups_always_kept(self, spark):
        from pyspark.sql import functions as F

        from tokenc.sorted_index import SortedKeyIndex

        df = spark.range(10).select(
            F.concat(F.lit("rg"), F.col("id")).alias("rg_id"),
            F.struct(
                F.when(F.col("id") == 7, F.lit(None).cast("string"))
                 .otherwise((F.col("id") * 10).cast("string")).alias("min_json"),
                F.when(F.col("id") == 7, F.lit(None).cast("string"))
                 .otherwise((F.col("id") * 10 + 9).cast("string")).alias("max_json"),
                F.lit(True).alias("sorted")).alias("k_meta"))
        idx = SortedKeyIndex.build(df, "k")
        assert set(idx.lookup(25)) == {"rg2", "rg7"}


class TestSortedKeyIndexEndToEnd:
    def test_lookup_on_real_encode(self, spark):
        from pyspark.sql import functions as F
        from pyspark.sql.pandas.types import to_arrow_schema

        from tokenc.engine import decode_df, encode_df
        from tokenc.schema import specs_from_arrow_schema
        from tokenc.sorted_index import SortedKeyIndex

        df = (spark.range(20_000)
              .select(F.col("id").alias("k"),
                      (F.col("id") % 97).alias("v"))
              .repartitionByRange(8, "k").sortWithinPartitions("k"))
        schema = to_arrow_schema(df.schema)
        specs = specs_from_arrow_schema(schema)
        enc = encode_df(df, specs, target_raw_bytes=32 << 10).cache()
        try:
            n_groups = enc.count()
            idx = SortedKeyIndex.build(enc, "k")
            assert idx.clustered and len(idx.rg_ids) == n_groups
            kept = idx.filter(enc, 12_345, 12_345)
            assert kept.count() <= 2  # the one (maybe two) matching groups
            rows = (decode_df(kept, specs, schema)
                    .where("k = 12345").collect())
            assert len(rows) == 1 and rows[0]["v"] == 12_345 % 97
            # string manifest stats parse through json round-trip
            assert json.loads("1") == 1
        finally:
            enc.unpersist()

    def test_string_keys(self, spark):
        from pyspark.sql import functions as F
        from pyspark.sql.pandas.types import to_arrow_schema

        from tokenc.engine import decode_df, encode_df
        from tokenc.schema import specs_from_arrow_schema
        from tokenc.sorted_index import SortedKeyIndex

        df = (spark.range(5000)
              .select(F.concat(F.lit("key"),
                               F.lpad(F.col("id").cast("string"), 7, "0"))
                      .alias("s"))
              .repartitionByRange(4, "s").sortWithinPartitions("s"))
        schema = to_arrow_schema(df.schema)
        specs = specs_from_arrow_schema(schema)
        enc = encode_df(df, specs, target_raw_bytes=16 << 10).cache()
        try:
            idx = SortedKeyIndex.build(enc, "s")
            assert idx.clustered
            kept = idx.filter(enc, "key0001234", "key0001234")
            dec = decode_df(kept, specs, schema)
            assert dec.where("s = 'key0001234'").count() == 1
        finally:
            enc.unpersist()
