"""In-process library mode (tokenc/local.py): no Spark, same format."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from tokenc.local import read_table, write_table


@pytest.fixture()
def table():
    rng = np.random.default_rng(0)
    n = 5000
    lens = rng.integers(0, 40, n)
    offs = np.zeros(n + 1, np.int32)
    np.cumsum(lens, out=offs[1:])
    toks = pa.ListArray.from_arrays(
        pa.array(offs), pa.array(rng.integers(0, 50000, int(lens.sum()), dtype=np.int64).astype(np.int32)))
    return pa.table({
        "doc_id": pa.array([f"d{i:06d}" for i in range(n)]),
        "tokens": toks,
        "n_tok": pa.array(lens.astype(np.int32)),
        "source": pa.array(rng.choice(["web", "book", "code"], n)),
    })


class TestLocalMode:
    def test_roundtrip(self, tmp_path, table):
        specs = write_table(table, str(tmp_path / "enc"), target_raw_bytes=64 << 10)
        out = read_table(str(tmp_path / "enc"), specs)
        assert out.num_rows == table.num_rows
        for name in table.column_names:
            assert out[name].combine_chunks().equals(table[name].combine_chunks()), name

    def test_projection(self, tmp_path, table):
        specs = write_table(table, str(tmp_path / "enc"))
        out = read_table(str(tmp_path / "enc"), specs, columns=["doc_id", "n_tok"])
        assert out.column_names == ["doc_id", "n_tok"]
        assert out["n_tok"].combine_chunks().equals(table["n_tok"].combine_chunks())
        with pytest.raises(ValueError, match="unknown columns"):
            read_table(str(tmp_path / "enc"), specs, columns=["nope"])

    def test_offset_count(self, tmp_path, table):
        specs = write_table(table, str(tmp_path / "enc"), target_raw_bytes=16 << 10)
        win = read_table(str(tmp_path / "enc"), specs, columns=["doc_id"],
                         offset=123, count=77)
        want = table["doc_id"].combine_chunks().slice(123, 77)
        assert win["doc_id"].combine_chunks().equals(want)
        assert read_table(str(tmp_path / "enc"), specs, offset=10**6, count=5).num_rows == 0

    def test_spark_reads_local_output(self, spark, tmp_path, table):
        """Library writer ↔ Spark decoder interop (same format)."""
        from pyspark.sql import functions as F

        from tokenc.engine import decode_df

        specs = write_table(table, str(tmp_path / "enc"), target_raw_bytes=64 << 10)
        enc = spark.read.parquet(str(tmp_path / "enc"))
        dec = decode_df(enc.select(*[f"{s.name}_blob" for s in specs]),
                        specs, table.schema)
        got = dec.agg(F.count("*"), F.sum("n_tok")).collect()[0]
        assert got[0] == table.num_rows
        assert got[1] == int(np.asarray(table["n_tok"]).sum())
