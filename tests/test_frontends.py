"""Ingestion frontends + streaming encode + report tooling tests."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from tokenc.datagen import TOKENS_ARROW_SCHEMA
from tokenc.schema import specs_from_arrow_schema

SPECS = specs_from_arrow_schema(TOKENS_ARROW_SCHEMA)


class TestIngest:
    def test_json_roundtrip(self, spark, tmp_path):
        from tokenc.engine import decode_df, encode_df
        from tokenc.ingest import tokens_from_json

        p = tmp_path / "in.jsonl"
        rows = [{"doc_id": f"d{i}", "tokens": list(range(i, i + 5)), "source": "s"}
                for i in range(50)]
        p.write_text("\n".join(json.dumps(r) for r in rows))
        df = tokens_from_json(spark, str(p))
        assert df.count() == 50
        dec = decode_df(encode_df(df, SPECS), SPECS, TOKENS_ARROW_SCHEMA)
        got = dec.orderBy("doc_id").toPandas()
        assert got["n_tok"].sum() == 250

    def test_csv_roundtrip(self, spark, tmp_path):
        from tokenc.ingest import tokens_from_csv

        p = tmp_path / "in.csv"
        lines = ["doc_id,tokens,source"] + [f"d{i},1 2 3 {i},s{i%3}" for i in range(20)]
        p.write_text("\n".join(lines))
        df = tokens_from_csv(spark, str(p))
        pdf = df.orderBy("doc_id").toPandas()
        assert (pdf["n_tok"] == 4).all()
        np.testing.assert_array_equal(pdf.iloc[0]["tokens"], [1, 2, 3, 0])


class TestStreaming:
    def test_streaming_encode_micro_batches(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from tokenc.streaming import streaming_encode

        src_dir = tmp_path / "stream_src"
        out = str(tmp_path / "stream_out")
        ckpt = str(tmp_path / "ckpt")
        # stage some files for a file-source stream
        from tokenc.datagen import synth_tokens_df

        synth_tokens_df(spark, 300, seed=9, mean_tokens=32, partitions=2) \
            .write.parquet(str(src_dir))
        stream = spark.readStream.schema(
            spark.read.parquet(str(src_dir)).schema).parquet(str(src_dir))
        q = streaming_encode(stream, SPECS, out, checkpoint=ckpt)
        q.awaitTermination(120)
        enc = spark.read.parquet(os.path.join(out, "data"))
        assert enc.agg(F.sum("n_rows")).collect()[0][0] == 300
        man = spark.read.parquet(os.path.join(out, "manifest"))
        assert man.where("column = 'tokens'").count() == enc.count()
