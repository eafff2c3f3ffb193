"""Structured-Streaming paths (tokenc/streaming.py): encode epochs via
foreachBatch (see also tests/test_frontends.py) and the round-4
streaming_decode read mirror."""

from __future__ import annotations


class TestStreamingDecode:
    def test_stream_decode_matches_batch(self, spark, tmp_path):
        """streaming_encode epochs → streaming_decode rows == the source
        (exactly-once across two separately committed epochs)."""
        import os

        from pyspark.sql import functions as F

        from tokenc.datagen import TOKENS_ARROW_SCHEMA, synth_tokens_df
        from tokenc.schema import specs_from_arrow_schema
        from tokenc.streaming import streaming_decode, streaming_encode

        specs = specs_from_arrow_schema(TOKENS_ARROW_SCHEMA)
        root = str(tmp_path / "stream")
        src_dir = os.path.join(root, "src")
        src = synth_tokens_df(spark, 400, seed=9, mean_tokens=64)
        src.write.mode("overwrite").parquet(src_dir)

        stream = spark.readStream.schema(
            spark.read.parquet(src_dir).schema) \
            .option("maxFilesPerTrigger", "2").parquet(src_dir)
        q = streaming_encode(stream, specs, os.path.join(root, "out"),
                             checkpoint=os.path.join(root, "ckpt"))
        q.awaitTermination(300)

        dec = streaming_decode(spark, os.path.join(root, "out"), specs,
                               TOKENS_ARROW_SCHEMA)
        assert dec.isStreaming
        q2 = (dec.writeStream.format("memory").queryName("dec_rows")
              .option("checkpointLocation", os.path.join(root, "ckpt2"))
              .trigger(availableNow=True).start())
        q2.awaitTermination(300)

        got = (spark.table("dec_rows")
               .select("doc_id", F.expr("aggregate(tokens, 0L, (a,x) -> a+x)")
                       .alias("ts"), "n_tok", "source")
               .orderBy("doc_id").collect())
        want = (src.select("doc_id",
                           F.expr("aggregate(tokens, 0L, (a,x) -> a+x)")
                           .alias("ts"), "n_tok", "source")
                .orderBy("doc_id").collect())
        assert got == want
