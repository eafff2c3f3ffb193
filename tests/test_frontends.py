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


class TestAvroFrontend:
    """Avro OCF source (tokenc/ingest.py::read_avro over the from-scratch
    tokenc/avro.py codec): schema derivation from the writer schema,
    multi-file decode in tasks, nullable unions, arrays of primitives,
    deflate codec, and composition with encode→decode."""

    def _write_tokens_ocf(self, path, docs, codec="null"):
        from tokenc.avro import write_ocf

        schema = {
            "type": "record", "name": "tok", "fields": [
                {"name": "doc_id", "type": "string"},
                {"name": "tokens",
                 "type": {"type": "array", "items": "int"}},
                {"name": "n_tok", "type": "int"},
                {"name": "source", "type": ["null", "string"]},
            ]}
        records = [{"doc_id": d, "tokens": t, "n_tok": len(t),
                    "source": s} for d, t, s in docs]
        with open(path, "wb") as f:
            f.write(write_ocf(schema, records, codec=codec))

    def test_read_avro_multi_file(self, spark, tmp_path):
        import os

        from tokenc.ingest import read_avro

        docs1 = [(f"a{i}", [i, i + 1, i + 2], "web") for i in range(40)]
        docs2 = [(f"b{i}", [i * 7], None) for i in range(25)]
        self._write_tokens_ocf(str(tmp_path / "p1.avro"), docs1)
        self._write_tokens_ocf(str(tmp_path / "p2.avro"), docs2,
                               codec="deflate")
        df = read_avro(spark, str(tmp_path))
        rows = {r["doc_id"]: r for r in df.collect()}
        assert len(rows) == 65
        assert list(rows["a3"]["tokens"]) == [3, 4, 5]
        assert rows["b5"]["source"] is None and rows["b5"]["n_tok"] == 1

    def test_avro_encode_decode_composes(self, spark, tmp_path):
        from pyspark.sql import functions as F
        from pyspark.sql.pandas.types import to_arrow_schema

        from tokenc.engine import decode_df, encode_df
        from tokenc.ingest import read_avro
        from tokenc.schema import specs_from_arrow_schema

        docs = [(f"d{i:03d}", [j % 50000 for j in range(i % 17 + 1)], "cc")
                for i in range(200)]
        self._write_tokens_ocf(str(tmp_path / "t.avro"), docs)
        src = read_avro(spark, str(tmp_path / "t.avro"))
        schema = to_arrow_schema(src.schema)
        specs = specs_from_arrow_schema(schema)
        dec = decode_df(encode_df(src, specs, target_raw_bytes=1 << 16),
                        specs, schema)
        got = dec.agg(F.count("*"), F.sum("n_tok"),
                      F.sum(F.expr("aggregate(tokens, 0L, (a,x)->a+x)"))
                      ).collect()[0]
        want_n = sum(len(t) for _, t, _ in docs)
        want_s = sum(sum(t) for _, t, _ in docs)
        assert tuple(got) == (200, want_n, want_s)
