"""End-to-end Spark encode→decode bit-identity (the north-rule gate).

Pattern mirrors the reference's write→read roundtrip tests
(/root/reference/writer/writer_test.go, writer/arrow_test.go:20-43): encode
the tokens table, decode it back, assert per-row token-array equality.
"""

from __future__ import annotations

import numpy as np
import pytest

from tokenc import codecs
from tokenc.datagen import TOKENS_ARROW_SCHEMA, synth_tokens_df, tokens_from_documents
from tokenc.engine import decode_df, encode_df
from tokenc.schema import ColumnSpec, specs_from_arrow_schema

SF_DIR = "/root/testdata/sf0.001"

SPECS = specs_from_arrow_schema(TOKENS_ARROW_SCHEMA)


def _assert_same(df_a, df_b, key="doc_id"):
    pa_ = df_a.orderBy(key).toPandas()
    pb_ = df_b.orderBy(key).toPandas()
    assert list(pa_.columns) == list(pb_.columns)
    assert len(pa_) == len(pb_)
    for c in pa_.columns:
        va, vb = pa_[c].values, pb_[c].values
        if len(va) and isinstance(va[0], np.ndarray):
            for x, y in zip(va, vb):
                np.testing.assert_array_equal(x, y)
        else:
            assert (va == vb).all(), c


class TestEncodeDecodeRoundtrip:
    def test_documents_tokens_bit_identity(self, spark):
        src = tokens_from_documents(spark, SF_DIR).cache()
        enc = encode_df(src, SPECS, target_raw_bytes=64 << 10)
        dec = decode_df(enc, SPECS, TOKENS_ARROW_SCHEMA)
        _assert_same(src, dec)

    def test_synth_tokens_bit_identity(self, spark):
        src = synth_tokens_df(spark, 800, seed=7, mean_tokens=96, partitions=4).cache()
        assert src.count() == 800
        enc = encode_df(src, SPECS, target_raw_bytes=128 << 10).cache()
        # multiple row groups must exist (sizing works)
        assert enc.count() > 1
        dec = decode_df(enc, SPECS, TOKENS_ARROW_SCHEMA)
        _assert_same(src, dec)

    def test_compression_beats_raw(self, spark):
        import pyspark.sql.functions as F

        src = synth_tokens_df(spark, 2000, seed=1, mean_tokens=128, partitions=2)
        enc = encode_df(src, SPECS)
        agg = enc.select(
            F.sum("tokens_meta.raw_bytes").alias("raw"),
            F.sum("tokens_meta.enc_bytes").alias("enc"),
        ).collect()[0]
        assert agg["enc"] < agg["raw"]

    def test_nulls_and_empty_lists(self, spark):
        import pandas as pd

        rows = [
            ("a", [1, 2, 3], 3, "s1"),
            ("b", None, None, "s2"),
            ("c", [], 0, None),
            ("d", [2**31 - 1, -2**31, 0], 3, "s1"),
            ("e", None, None, None),
        ] * 20
        from tokenc.engine import from_arrow_schema

        src = spark.createDataFrame(rows, from_arrow_schema(TOKENS_ARROW_SCHEMA)).coalesce(1).cache()
        enc = encode_df(src, SPECS)
        dec = decode_df(enc, SPECS, TOKENS_ARROW_SCHEMA)
        a = src.orderBy("doc_id").toPandas()
        b = dec.orderBy("doc_id").toPandas()
        for c in a.columns:
            for x, y in zip(a[c].values, b[c].values):
                if isinstance(x, np.ndarray) or isinstance(y, np.ndarray):
                    assert (x is not None) == (y is not None)
                    np.testing.assert_array_equal(x, y)
                else:
                    assert (x == y) or (pd.isna(x) and pd.isna(y)), (c, x, y)

    def test_forced_codec_override(self, spark):
        import pyspark.sql.functions as F

        specs = specs_from_arrow_schema(TOKENS_ARROW_SCHEMA,
                                        codec_overrides={"tokens": "plain", "doc_id": "fsst"})
        src = synth_tokens_df(spark, 300, seed=3, mean_tokens=64, partitions=2)
        enc = encode_df(src, specs)
        row = enc.select("tokens_meta.codec", "doc_id_meta.codec").first()
        assert row[0] == "plain" and row[1] == "fsst"
        dec = decode_df(enc, specs, TOKENS_ARROW_SCHEMA)
        assert dec.count() == 300
