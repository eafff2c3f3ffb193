"""Sequence packing (tokenc/pipeline/packing.py): GPT-style concatenate +
fixed-window split, two-phase prefix sum, slice-per-window reassembly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _pack_py(docs, L, eos=None):
    """Reference packing in plain Python: concat in order, cut every L."""
    stream = []
    for _, toks in sorted(docs):
        stream.extend(toks)
        if eos is not None:
            stream.append(eos)
    return [stream[i:i + L] for i in range(0, len(stream), L)]


def _run(spark, docs, L, eos=None, parts=3):
    from tokenc.pipeline.packing import pack_sequences

    df = spark.createDataFrame(docs, "doc_id string, tokens array<int>")
    out = (pack_sequences(df, L, eos_token=eos, num_partitions=parts)
           .orderBy("seq_id").collect())
    assert [r["seq_id"] for r in out] == list(range(len(out)))
    assert all(r["n_tok"] == len(r["tokens"]) for r in out)
    return [list(r["tokens"]) for r in out]


class TestPackSequences:
    def test_matches_python_reference(self, spark):
        docs = [(f"d{i:02d}", list(range(i * 100, i * 100 + (i * 7) % 23 + 1)))
                for i in range(20)]
        for L in (8, 16, 64):
            assert _run(spark, docs, L) == _pack_py(docs, L)
            assert _run(spark, docs, L, eos=50000) == _pack_py(docs, L, 50000)

    def test_exact_boundary_and_long_doc(self, spark):
        # d1 fills window 0 exactly; d2 spans three full windows
        docs = [("a", list(range(8))), ("b", list(range(100, 124)))]
        got = _run(spark, docs, 8)
        assert got == _pack_py(docs, 8)
        assert len(got) == 4 and all(len(s) == 8 for s in got)

    def test_short_final_window_kept(self, spark):
        docs = [("a", [1, 2, 3]), ("b", [4, 5])]
        got = _run(spark, docs, 4, eos=9)
        assert got == [[1, 2, 3, 9], [4, 5, 9]]

    def test_empty_tokens_contribute_only_eos(self, spark):
        docs = [("a", []), ("b", [7])]
        assert _run(spark, docs, 4, eos=9) == [[9, 7, 9]]
        # without EOS an empty doc contributes nothing
        assert _run(spark, docs, 4) == [[7]]

    def test_empty_input(self, spark):
        from tokenc.pipeline.packing import pack_sequences

        df = spark.createDataFrame([], "doc_id string, tokens array<int>")
        assert pack_sequences(df, 8).count() == 0

    def test_n_docs_counts_contributors(self, spark):
        docs = [("a", [1, 2]), ("b", [3, 4]), ("c", [5, 6, 7, 8, 9])]
        from tokenc.pipeline.packing import pack_sequences

        df = spark.createDataFrame(docs, "doc_id string, tokens array<int>")
        rows = {r["seq_id"]: r for r in
                pack_sequences(df, 4, num_partitions=2).collect()}
        # windows: [1,2,3,4] [5,6,7,8] [9] → contributors 2,1,1
        assert [rows[i]["n_docs"] for i in range(3)] == [2, 1, 1]

    @pytest.mark.parametrize("parts", [1, 2, 7])
    def test_partitioning_invariant(self, spark, parts):
        docs = [(f"d{i:03d}", [i] * (i % 13 + 1)) for i in range(60)]
        assert _run(spark, docs, 32, eos=0, parts=parts) \
            == _pack_py(docs, 32, 0)

    def test_reconstruction_total_stream(self, spark):
        docs = [(f"d{i:02d}", [i * 10 + j for j in range(i + 1)])
                for i in range(12)]
        got = _run(spark, docs, 10)
        flat = [t for s in got for t in s]
        want = [t for _, toks in sorted(docs) for t in toks]
        assert flat == want

    def test_deterministic_at_sampler_subset_scale(self, spark):
        # > 20x num_partitions rows with skewed doc sizes: the regime
        # where a RangePartitioner sample is a strict subset of rows and
        # the round-3 two-action design could assign boundary docs
        # different partitions per job. The value-deterministic bucketing
        # must return bit-identical windows on every invocation and match
        # the Python reference exactly.
        import random

        rng = random.Random(7)
        docs = [(f"d{i:04d}",
                 [rng.randrange(50000) for _ in
                  range((i * 37) % 199 + 1 + (2000 if i % 97 == 0 else 0))])
                for i in range(600)]
        want = _pack_py(docs, 256, 50000)
        runs = [_run(spark, docs, 256, eos=50000, parts=8)
                for _ in range(3)]
        assert runs[0] == want and runs[1] == want and runs[2] == want

    def test_deterministic_numeric_order_col(self, spark):
        # the driver path packs on a LONG doc_id — same determinism bar
        from tokenc.pipeline.packing import pack_sequences

        docs = [(i, [i % 101] * ((i * 13) % 57 + 1)) for i in range(400)]
        df = spark.createDataFrame(docs, "doc_id long, tokens array<int>")
        a = (pack_sequences(df, 128, eos_token=0, num_partitions=8)
             .orderBy("seq_id").collect())
        b = (pack_sequences(df, 128, eos_token=0, num_partitions=8)
             .orderBy("seq_id").collect())
        assert [list(r["tokens"]) for r in a] == \
            [list(r["tokens"]) for r in b] == _pack_py(docs, 128, 0)

    def test_explicit_boundaries(self, spark):
        from tokenc.pipeline.packing import pack_sequences

        docs = [(f"d{i:02d}", [i] * (i + 1)) for i in range(30)]
        df = spark.createDataFrame(docs, "doc_id string, tokens array<int>")
        out = (pack_sequences(df, 16, boundaries=["d08", "d16", "d24"])
               .orderBy("seq_id").collect())
        assert [list(r["tokens"]) for r in out] == _pack_py(docs, 16)

    def test_property_random_docs(self, spark):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from tokenc.pipeline.packing import pack_sequences

        @settings(max_examples=8, deadline=None)
        @given(st.lists(st.lists(st.integers(0, 49999), max_size=40),
                        min_size=1, max_size=40),
               st.integers(2, 17))
        def check(token_lists, L):
            docs = [(f"d{i:03d}", toks)
                    for i, toks in enumerate(token_lists)]
            df = spark.createDataFrame(docs,
                                       "doc_id string, tokens array<int>")
            out = (pack_sequences(df, L, eos_token=0, num_partitions=3)
                   .orderBy("seq_id").collect())
            assert [list(r["tokens"]) for r in out] == _pack_py(docs, L, 0)

        check()

    def test_no_python_udfs_in_plan(self, spark):
        from tokenc.pipeline.packing import pack_sequences

        df = spark.createDataFrame([("a", [1])], "doc_id string, tokens array<int>")
        plan = pack_sequences(df, 8)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
