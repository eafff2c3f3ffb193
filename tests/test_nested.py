"""Nested columns: list<string> leaves, struct/map shredding, full engine
roundtrips through encode→decode→unshred."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _roundtrip(spark, df):
    from pyspark.sql.pandas.types import to_arrow_schema

    from tokenc.engine import decode_df, encode_df
    from tokenc.schema import specs_from_arrow_schema

    schema = to_arrow_schema(df.schema)
    specs = specs_from_arrow_schema(schema)
    return decode_df(encode_df(df, specs, target_raw_bytes=64 << 10),
                     specs, schema)


def _sorted_pdf(df, key):
    return (df.orderBy(key).toPandas().reset_index(drop=True))


class TestListOfStrings:
    def test_roundtrip_with_nulls_and_empties(self, spark):
        rows = [
            (0, ["alpha", "beta", "gamma"]),
            (1, []),                        # empty list
            (2, None),                      # null list
            (3, ["", "x" * 300, "mid"]),    # empty string element + long
            (4, ["solo"]),
        ] * 50
        rows = [(i, r[1]) for i, r in enumerate(rows)]
        df = spark.createDataFrame(rows, "id long, tags array<string>")
        out = _sorted_pdf(_roundtrip(spark, df), "id")
        src = _sorted_pdf(df, "id")
        assert len(out) == len(src)
        for a, b in zip(src["tags"], out["tags"]):
            if a is None:
                assert b is None
            else:
                assert list(a) == list(b)

    def test_documents_words_roundtrip(self, spark):
        docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
                .select("doc_id", F.expr(
                    "filter(split(text, ' '), w -> length(w) > 0)").alias("words")))
        out = _sorted_pdf(_roundtrip(spark, docs), "doc_id")
        src = _sorted_pdf(docs, "doc_id")
        for a, b in zip(src["words"], out["words"]):
            assert list(a) == list(b)


class TestShred:
    @pytest.fixture()
    def nested_df(self, spark):
        rows = []
        for i in range(200):
            st = None if i % 7 == 0 else (f"ev{i % 5}", float(i) / 3, None if i % 3 == 0 else i)
            mp = None if i % 11 == 0 else (
                {} if i % 5 == 0 else {"a": str(i), "kk" + str(i % 3): "v" * (i % 4)})
            rows.append((i, st, mp, [f"t{i % 3}", "x"] if i % 2 else []))
        return spark.createDataFrame(
            rows,
            "id long, s struct<name:string, val:double, cnt:long>, "
            "m map<string,string>, tags array<string>")

    def test_shred_unshred_identity(self, spark, nested_df):
        from tokenc.shred import shred_df, unshred_df

        flat = shred_df(nested_df)
        # leaves only: no struct/map types remain
        for f in flat.schema.fields:
            assert not str(f.dataType).startswith(("StructType", "MapType"))
        back = unshred_df(flat, nested_df.schema)
        a = _sorted_pdf(nested_df, "id")
        b = _sorted_pdf(back, "id")
        pd.testing.assert_frame_equal(a, b)

    def test_nested_engine_roundtrip(self, spark, nested_df):
        """struct + map + list<string> through shred → encode → decode →
        unshred: exact, including null struct / null map / empty map."""
        from tokenc.shred import shred_df, unshred_df

        flat = shred_df(nested_df)
        dec = _roundtrip(spark, flat)
        back = unshred_df(dec, nested_df.schema)
        a = _sorted_pdf(nested_df, "id")
        b = _sorted_pdf(back, "id")
        pd.testing.assert_frame_equal(a, b)

    def test_null_list_elements_roundtrip(self, spark):
        """Element-level nulls (Dremel DL between empty and value) must
        round-trip exactly — null map values are the everyday case."""
        rows = []
        for i in range(300):
            tags = {0: ["a", None, "b"], 1: [None], 2: [], 3: None,
                    4: ["x" * (i % 7)]}[i % 5]
            xs = {0: [1, None, 3], 1: [None, None], 2: [i], 3: None,
                  4: []}[i % 5]
            rows.append((i, tags, xs))
        df = spark.createDataFrame(
            rows, "id long, tags array<string>, xs array<int>")
        out = _sorted_pdf(_roundtrip(spark, df), "id")
        src = _sorted_pdf(df, "id")
        for col in ("tags", "xs"):
            for a, b in zip(src[col], out[col]):
                if a is None:
                    assert b is None
                else:
                    assert list(a) == list(b), (col, a, b)

    def test_map_with_null_values_roundtrip(self, spark):
        from pyspark.sql import functions as F

        from tokenc.shred import shred_df, unshred_df

        df = spark.range(200).select(
            F.col("id"),
            F.expr("CASE WHEN id % 7 = 0 THEN NULL "
                   "ELSE map('a', CASE WHEN id % 3 = 0 THEN NULL "
                   "ELSE cast(id AS string) END, 'b', 'x') END").alias("m"))
        back = unshred_df(_roundtrip(spark, shred_df(df)), df.schema)
        pd.testing.assert_frame_equal(_sorted_pdf(df, "id"),
                                      _sorted_pdf(back, "id"))

    def test_struct_field_with_dot_in_name(self, spark):
        from tokenc.shred import shred_df, unshred_df

        df = spark.createDataFrame(
            [(i, (i * 2, f"v{i}")) for i in range(50)],
            "id long, s struct<`a.b`:long, name:string>")
        back = unshred_df(_roundtrip(spark, shred_df(df)), df.schema)
        pd.testing.assert_frame_equal(_sorted_pdf(df, "id"),
                                      _sorted_pdf(back, "id"))

    def test_decimal38_roundtrip_extremes(self, spark):
        """decimal(38,4) over FLBA: values beyond int64 unscaled, signs,
        nulls — bit-exact through encode→decode."""
        from decimal import Decimal

        vals = [Decimal("9999999999999999999999999999999999.9999"),
                Decimal("-9999999999999999999999999999999999.9999"),
                Decimal("0.0001"), Decimal("-0.0001"), Decimal("0.0000"),
                Decimal("12345678901234567890.1234"), None,
                Decimal("-98765432109876543210987654321.5000")] * 40
        rows = [(i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "id long, d decimal(38,4)")
        out = _sorted_pdf(_roundtrip(spark, df), "id")
        src = _sorted_pdf(df, "id")
        assert src["d"].tolist() == out["d"].tolist()

    def test_array_of_structs(self, spark):
        """array<struct> shreds to aligned per-field arrays (+ element
        validity) and reassembles exactly — incl. null struct elements,
        struct-of-null-fields, empty arrays and null arrays."""
        from tokenc.shred import shred_df, unshred_df

        rows = []
        for i in range(240):
            mode = i % 6
            if mode == 0:
                items = None
            elif mode == 1:
                items = []
            elif mode == 2:
                items = [(i, f"a{i}"), (i + 1, None)]   # null field
            elif mode == 3:
                items = [None, (i * 2, "x")]            # null element
            else:
                items = [(i, "y")] * (mode - 2)
            rows.append((i, items))
        df = spark.createDataFrame(
            rows, "id long, items array<struct<n:long, s:string>>")
        flat = shred_df(df)
        for f in flat.schema.fields:   # only flat leaf arrays remain
            assert not str(f.dataType).startswith(("StructType", "MapType"))
            assert "struct" not in f.dataType.simpleString()
        back = unshred_df(_roundtrip(spark, flat), df.schema)
        pd.testing.assert_frame_equal(_sorted_pdf(df, "id"),
                                      _sorted_pdf(back, "id"))

    def test_array_of_arrays(self, spark):
        """array<array<int>> (repeated-of-repeated): null outer, empty
        outer, null inner, empty inner — exact roundtrip via the Arrow
        offset-arithmetic reassembly."""
        from tokenc.shred import shred_df, unshred_df

        rows = []
        for i in range(240):
            aa = {0: None, 1: [], 2: [[1, 2], None, []],
                  3: [[i]], 4: [[], [i, i + 1, i + 2]],
                  5: [None]}[i % 6]
            rows.append((i, aa))
        df = spark.createDataFrame(rows, "id long, aa array<array<int>>")
        flat = shred_df(df)
        assert set(flat.columns) == {"id", "aa__~olens", "aa__~flat"}
        back = unshred_df(_roundtrip(spark, flat), df.schema)
        src = _sorted_pdf(df, "id")
        out = _sorted_pdf(back, "id")
        for a, b in zip(src["aa"], out["aa"]):
            if a is None:
                assert b is None
            else:
                assert len(a) == len(b)
                for x, y in zip(a, b):
                    if x is None:
                        assert y is None
                    else:
                        assert list(x) == list(y)

    def test_doubly_nested_struct(self, spark):
        from tokenc.shred import shred_df, unshred_df

        rows = [(i, ((i, f"n{i}"), i * 0.5) if i % 4 else None)
                for i in range(100)]
        df = spark.createDataFrame(
            rows, "id long, outer struct<inner:struct<a:long,b:string>, w:double>")
        flat = shred_df(df)
        back = unshred_df(_roundtrip(spark, flat), df.schema)
        pd.testing.assert_frame_equal(_sorted_pdf(df, "id"),
                                      _sorted_pdf(back, "id"))


def _deep_roundtrip(spark, df):
    from tokenc.shred import shred_df, unshred_df

    flat = shred_df(df)
    # shred must bottom out in engine leaves only
    for f in flat.schema.fields:
        s = f.dataType.simpleString()
        assert "struct" not in s and "map" not in s, (f.name, s)
        assert s.count("array") <= 1, (f.name, s)
    return unshred_df(_roundtrip(spark, flat), df.schema)


def _assert_col_equal(src_pdf, out_pdf, col):
    def norm(v):
        if v is None:
            return None
        if isinstance(v, dict):
            return {k: norm(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
            return [norm(x) for x in list(v)]
        if hasattr(v, "asDict"):
            return {k: norm(x) for k, x in v.asDict().items()}
        return v

    for i, (a, b) in enumerate(zip(src_pdf[col], out_pdf[col])):
        assert norm(a) == norm(b), (col, i, a, b)


class TestDeepNesting:
    """Recursive shredding beyond one composite level (reference
    marshal/marshal.go:227-343 arbitrary-depth recursion; max DL/RL per
    path schema/schemahandler.go:92-150)."""

    def test_array_of_struct_with_map(self, spark):
        rows = []
        for i in range(240):
            mode = i % 6
            if mode == 0:
                v = None
            elif mode == 1:
                v = []
            elif mode == 2:
                v = [(i, {"a": str(i), "b": None}), None]
            elif mode == 3:
                v = [(i, None), (i + 1, {})]
            else:
                v = [(i, {"k" + str(i % 3): "v" * (i % 4)})]
            rows.append((i, v))
        df = spark.createDataFrame(
            rows, "id long, items array<struct<n:long, tags:map<string,string>>>")
        back = _deep_roundtrip(spark, df)
        _assert_col_equal(_sorted_pdf(df, "id"), _sorted_pdf(back, "id"), "items")

    def test_map_of_struct(self, spark):
        rows = []
        for i in range(200):
            mode = i % 5
            if mode == 0:
                v = None
            elif mode == 1:
                v = {}
            elif mode == 2:
                v = {"x": (i, f"s{i}"), "y": None}
            else:
                v = {"z" + str(i % 3): (i * 2, None)}
            rows.append((i, v))
        df = spark.createDataFrame(
            rows, "id long, m map<string, struct<a:long, b:string>>")
        back = _deep_roundtrip(spark, df)
        _assert_col_equal(_sorted_pdf(df, "id"), _sorted_pdf(back, "id"), "m")

    def test_map_of_array(self, spark):
        rows = []
        for i in range(200):
            mode = i % 5
            v = {0: None, 1: {}, 2: {"a": [1, None, i], "b": None},
                 3: {"c": []}, 4: {"d": [i, i + 1]}}[mode]
            rows.append((i, v))
        df = spark.createDataFrame(rows, "id long, m map<string, array<int>>")
        back = _deep_roundtrip(spark, df)
        _assert_col_equal(_sorted_pdf(df, "id"), _sorted_pdf(back, "id"), "m")

    def test_triple_nested_array(self, spark):
        rows = []
        for i in range(240):
            mode = i % 6
            v = {0: None, 1: [], 2: [[[1, 2], None, []], None],
                 3: [[[i]]], 4: [[], [[], [i, None]]],
                 5: [None, [[i, i + 1]]]}[mode]
            rows.append((i, v))
        df = spark.createDataFrame(rows, "id long, aaa array<array<array<int>>>")
        back = _deep_roundtrip(spark, df)
        _assert_col_equal(_sorted_pdf(df, "id"), _sorted_pdf(back, "id"), "aaa")

    def test_array_of_map(self, spark):
        rows = []
        for i in range(200):
            mode = i % 5
            v = {0: None, 1: [], 2: [{"a": 1, "b": None}, None],
                 3: [{}], 4: [{"c": i}, {"d": i + 1}]}[mode]
            rows.append((i, v))
        df = spark.createDataFrame(rows, "id long, am array<map<string,int>>")
        back = _deep_roundtrip(spark, df)
        _assert_col_equal(_sorted_pdf(df, "id"), _sorted_pdf(back, "id"), "am")

    def test_struct_of_array_of_struct(self, spark):
        rows = []
        for i in range(200):
            mode = i % 4
            if mode == 0:
                v = None
            elif mode == 1:
                v = ([], i * 1.5)
            elif mode == 2:
                v = ([(i, [1, 2]), None], None)
            else:
                v = ([(i, None)], float(i))
            rows.append((i, v))
        df = spark.createDataFrame(
            rows,
            "id long, o struct<items:array<struct<n:long, xs:array<int>>>, w:double>")
        back = _deep_roundtrip(spark, df)
        _assert_col_equal(_sorted_pdf(df, "id"), _sorted_pdf(back, "id"), "o")

    def test_collision_prone_field_names(self, spark):
        """Fields literally named 'valid', 'a__b', or containing '~' must
        not collide with generated marker/path names."""
        rows = [(i, (bool(i % 2), i, f"t{i}")) for i in range(60)]
        df = spark.createDataFrame(
            rows, "id long, s struct<valid:boolean, `a__b`:long, `x~y`:string>")
        from tokenc.shred import shred_df, unshred_df

        flat = shred_df(df)
        assert len(set(flat.columns)) == len(flat.columns)
        back = unshred_df(_roundtrip(spark, flat), df.schema)
        pd.testing.assert_frame_equal(_sorted_pdf(df, "id"),
                                      _sorted_pdf(back, "id"))


class TestLogicalListElements:
    """Logical DATE/TIMESTAMP/DECIMAL elements under a repeated group
    (reference schema/schemahandler.go:297-335: ordinary leaf types below
    REPEATED) — stored as the storage integer, restored exactly."""

    def test_timestamp_and_date_lists(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 3, 1, 12, 0, 0)
        rows = []
        for i in range(200):
            mode = i % 5
            ts = {0: None, 1: [],
                  2: [base + dt.timedelta(seconds=i), None],
                  3: [base - dt.timedelta(days=i)],
                  4: [base, base + dt.timedelta(microseconds=i)]}[mode]
            ds = {0: [dt.date(2020, 1, 1) + dt.timedelta(days=i), None],
                  1: None, 2: [], 3: [dt.date(1969, 12, 31)],
                  4: [dt.date(2024, 2, 29)]}[mode]
            rows.append((i, ts, ds))
        df = spark.createDataFrame(
            rows, "id long, ts array<timestamp>, ds array<date>")
        out = _sorted_pdf(_roundtrip(spark, df), "id")
        src = _sorted_pdf(df, "id")
        for col in ("ts", "ds"):
            for a, b in zip(src[col], out[col]):
                if a is None:
                    assert b is None
                else:
                    assert list(a) == list(b), (col, a, b)

    def test_decimal_lists(self, spark):
        from decimal import Decimal

        rows = []
        for i in range(200):
            mode = i % 5
            v = {0: None, 1: [],
                 2: [Decimal(str(i)) / 100, None],
                 3: [Decimal("-99999999999999.1234")],
                 4: [Decimal("0.0001") * i, Decimal("12345.6789")]}[mode]
            rows.append((i, v))
        df = spark.createDataFrame(rows, "id long, xs array<decimal(18,4)>")
        out = _sorted_pdf(_roundtrip(spark, df), "id")
        src = _sorted_pdf(df, "id")
        for a, b in zip(src["xs"], out["xs"]):
            if a is None:
                assert b is None
            else:
                assert list(a) == list(b), (a, b)
