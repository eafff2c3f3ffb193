"""FLBA (fixed-size binary) logical types — UUID(16)/INTERVAL(12) — and
dictionary-encoded (ENUM-style) Arrow input.

Reference parity: PLAIN FLBA (encoding/encodingwrite.go:123-130), the
UUID/INTERVAL/ENUM converted types (common/common.go:330-525). FLBA rides
the generic byte_array machinery with constant stride; dictionary input is
densified on extract (the engine's selector re-derives its own dictionary).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tokenc.local import read_table, write_table
from tokenc.schema import specs_from_arrow_schema
from tokenc import codecs


def _fsb_column(n: int, width: int, *, nulls: bool, seed: int = 7) -> pa.Array:
    rng = np.random.default_rng(seed)
    raw = rng.integers(0, 256, size=(n, width), dtype=np.uint8)
    raw[::5] = raw[0]  # repeats → dictionary-friendly
    if not nulls:
        return pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(width), n, [None, pa.py_buffer(raw.tobytes())])
    mask = np.arange(n) % 11 == 0
    return pa.array([None if m else v.tobytes() for v, m in zip(raw, mask)],
                    type=pa.binary(width))


class TestFLBA:
    def test_specs(self):
        specs = specs_from_arrow_schema(pa.schema([("u", pa.binary(16))]))
        assert specs[0].phys == codecs.PHYS_BYTE_ARRAY
        assert specs[0].arrow_type == pa.binary(16)

    @pytest.mark.parametrize("width", [12, 16])
    @pytest.mark.parametrize("nulls", [False, True])
    def test_roundtrip(self, tmp_path, width, nulls):
        tbl = pa.table({"u": _fsb_column(4000, width, nulls=nulls)})
        write_table(tbl, str(tmp_path / "t"))
        out = read_table(str(tmp_path / "t"))
        assert out.schema.field("u").type == pa.binary(width)
        assert out.equals(tbl)

    def test_all_null_and_empty(self, tmp_path):
        tbl = pa.table({"u": pa.array([None] * 100, type=pa.binary(16))})
        write_table(tbl, str(tmp_path / "an"))
        assert read_table(str(tmp_path / "an")).equals(tbl)
        empty = pa.table({"u": pa.array([], type=pa.binary(16))})
        write_table(empty, str(tmp_path / "e"))
        assert read_table(str(tmp_path / "e")).equals(empty)

    def test_sliced_input(self, tmp_path):
        base = _fsb_column(4000, 16, nulls=True)
        tbl = pa.table({"u": base.slice(37, 1111)})
        write_table(tbl, str(tmp_path / "s"))
        # read_table returns offset-0 arrays; compare values
        got = read_table(str(tmp_path / "s")).column("u").combine_chunks()
        assert got.to_pylist() == base.slice(37, 1111).to_pylist()

    def test_stats_lexicographic(self, tmp_path):
        import json

        from tokenc.chunk import encode_chunk
        from tokenc.engine import _extract

        # valid-UTF-8 fixed-width values: exact lexicographic stats
        rng = np.random.default_rng(7)
        vals_ascii = ["".join(chr(c) for c in rng.integers(48, 122, 16))
                      .encode() for _ in range(1000)]
        arr = pa.array(vals_ascii, type=pa.binary(16))
        cd = _extract(arr, specs_from_arrow_schema(
            pa.schema([("u", pa.binary(16))]))[0])
        _, st = encode_chunk(phys=codecs.PHYS_BYTE_ARRAY, codec=codecs.PLAIN,
                             n_rows=1000,
                             ba_data=cd["ba_data"], ba_offsets=cd["ba_offsets"])
        svals = sorted(vals_ascii)
        assert st.min_val == svals[0] and st.max_val == svals[-1]

        # raw random binary (invalid UTF-8): stats are intentionally
        # ABSENT — the utf-8-replace JSON they travel in cannot carry a
        # sound byte-order bound (chunks are kept, never pruned; blooms
        # and distinct lists still serve point lookups)
        arr = _fsb_column(1000, 16, nulls=False)
        cd = _extract(arr, specs_from_arrow_schema(
            pa.schema([("u", pa.binary(16))]))[0])
        _, st = encode_chunk(phys=codecs.PHYS_BYTE_ARRAY, codec=codecs.PLAIN,
                             n_rows=1000,
                             ba_data=cd["ba_data"], ba_offsets=cd["ba_offsets"])
        assert st.min_val is None and st.max_val is None

    def test_encode_files_over_flba_parquet(self, spark, tmp_path):
        """Production shape: a parquet data file whose column IS FLBA
        (e.g. written by the reference for a UUID field) flows through the
        file-granular encode/decode path unchanged."""
        from tokenc.files import decode_files, encode_files

        arr = _fsb_column(6000, 16, nulls=True, seed=3)
        tbl = pa.table({"u": arr})
        src = tmp_path / "src"
        src.mkdir()
        pq.write_table(tbl, str(src / "part-0.parquet"))
        specs = specs_from_arrow_schema(tbl.schema)
        enc = encode_files(spark, str(src), specs, target_raw_bytes=1 << 16)
        enc_dir = tmp_path / "enc"
        enc.write.mode("overwrite").parquet(str(enc_dir))
        out = decode_files(spark, str(enc_dir), specs, tbl.schema).toPandas()
        got = [None if v is None else bytes(v) for v in out["u"]]
        want = arr.to_pylist()
        keyf = lambda x: (x is None, x or b"")
        assert sorted(got, key=keyf) == sorted(want, key=keyf)


class TestDictionaryInput:
    def test_string_dictionary(self, tmp_path):
        vals = (["alpha", "beta", "gamma", None] * 500)[:1999]
        tbl = pa.table({"c": pa.array(vals).dictionary_encode()})
        write_table(tbl, str(tmp_path / "d"))
        out = read_table(str(tmp_path / "d"))
        # dict encoding is an input representation: reads back as values
        assert out.column("c").to_pylist() == vals

    def test_int_dictionary(self, tmp_path):
        vals = pa.array(([7, 11, 13] * 700)[:2000], type=pa.int32())
        tbl = pa.table({"c": vals.dictionary_encode()})
        write_table(tbl, str(tmp_path / "di"))
        assert read_table(str(tmp_path / "di")).column("c") \
            .combine_chunks().equals(vals)
