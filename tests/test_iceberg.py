"""Iceberg front door (tokenc/iceberg.py) + the from-scratch Avro OCF
codec (tokenc/avro.py) it rides on. Fixtures are built by build_table —
a faithful spec-v2 subset (metadata JSON → manifest-list.avro →
manifest.avro) — so the reader is exercised on the real wire format."""

from __future__ import annotations

import io
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tokenc.avro import _read_long, _write_long, read_ocf, write_ocf
from tokenc.iceberg import (MANIFEST_ENTRY_SCHEMA, build_table,
                            encode_iceberg, plan_files, table_metadata)


class TestAvro:
    def test_zigzag_golden(self):
        # the Avro spec's own example encodings
        for v, b in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"),
                     (2, b"\x04"), (-64, b"\x7f"), (64, b"\x80\x01")]:
            out = bytearray()
            _write_long(out, v)
            assert bytes(out) == b, v
            assert _read_long(io.BytesIO(b)) == v

    def test_ocf_header_golden(self):
        blob = write_ocf("int", [3])
        assert blob[:4] == b"Obj\x01"          # spec magic
        # one metadata block with 2 entries, first key "avro.schema"
        buf = io.BytesIO(blob[4:])
        assert _read_long(buf) == 2
        klen = _read_long(buf)
        assert buf.read(klen) == b"avro.schema"

    @pytest.mark.parametrize("codec", ["null", "deflate"])
    def test_roundtrip_all_types(self, codec):
        schema = {"type": "record", "name": "r", "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"]},
            {"name": "c", "type": {"type": "array", "items": "int"}},
            {"name": "d", "type": {"type": "map", "values": "double"}},
            {"name": "e", "type": {"type": "fixed", "name": "fx", "size": 3}},
            {"name": "f", "type": {"type": "enum", "name": "en",
                                   "symbols": ["X", "Y"]}},
            {"name": "g", "type": "boolean"},
            {"name": "h", "type": "bytes"},
            {"name": "i", "type": "float"},
        ]}
        recs = [{"a": -(1 << 60), "b": None, "c": list(range(300)),
                 "d": {"k": 1.5, "j": -0.25}, "e": b"abc", "f": "Y",
                 "g": True, "h": b"\x00\xff", "i": 0.5},
                {"a": 7, "b": "héllo", "c": [], "d": {}, "e": b"xyz",
                 "f": "X", "g": False, "h": b"", "i": -2.0}]
        s2, r2 = read_ocf(write_ocf(schema, recs, codec=codec))
        assert r2 == recs and s2["name"] == "r"

    def test_corrupt_sync_detected(self):
        blob = bytearray(write_ocf("int", [1, 2, 3]))
        blob[-1] ^= 0xFF
        with pytest.raises(ValueError, match="sync"):
            read_ocf(bytes(blob))


@pytest.fixture()
def table_dir(tmp_path):
    root = str(tmp_path / "tbl")
    data = os.path.join(root, "data")
    os.makedirs(data)
    paths = []
    for i, vals in enumerate([[1, 2, 3], [4, 5]]):
        p = os.path.join(data, f"f{i}.parquet")
        pq.write_table(pa.table({"x": pa.array(vals, pa.int32())}), p)
        paths.append(p)
    return root, paths


class TestIcebergPlan:
    def test_plan_and_append_and_time_travel(self, table_dir):
        root, (f1, f2) = table_dir
        m1 = build_table(root, [f1])
        assert [d.record_count for d in plan_files(root)] == [3]
        build_table(root, [f2], snapshot_id=2, parent=m1)
        assert sorted(os.path.basename(d.path)
                      for d in plan_files(root)) == ["f0.parquet", "f1.parquet"]
        old = plan_files(root, snapshot_id=1)
        assert [os.path.basename(d.path) for d in old] == ["f0.parquet"]
        assert table_metadata(root)["current-snapshot-id"] == 2

    def test_deleted_entries_and_delete_files_skipped(self, table_dir):
        root, (f1, f2) = table_dir
        build_table(root, [f1, f2])
        # rewrite the manifest with f2 marked DELETED and a v2 delete file
        meta_dir = os.path.join(root, "metadata")
        mpath = os.path.join(meta_dir, "snap1-m0.avro")
        schema, entries = read_ocf(open(mpath, "rb").read())
        entries[1]["status"] = 2  # DELETED
        entries.append({"status": 1, "snapshot_id": 1,
                        "sequence_number": None, "file_sequence_number": None,
                        "data_file": {"content": 1,  # position deletes
                                      "file_path": "file:///nope.parquet",
                                      "file_format": "PARQUET",
                                      "partition": {}, "record_count": 0,
                                      "file_size_in_bytes": 0}})
        open(mpath, "wb").write(write_ocf(MANIFEST_ENTRY_SCHEMA, entries))
        plan = plan_files(root)
        assert [os.path.basename(d.path) for d in plan] == ["f0.parquet"]

    def test_moved_table_resolves(self, table_dir, tmp_path):
        root, (f1, f2) = table_dir
        build_table(root, [f1, f2])
        moved = str(tmp_path / "moved")
        shutil.move(root, moved)
        plan = plan_files(moved)
        assert len(plan) == 2 and all(d.path.startswith(moved) for d in plan)
        assert all(os.path.exists(d.path) for d in plan)

    def test_empty_table(self, tmp_path):
        root = str(tmp_path / "empty")
        os.makedirs(os.path.join(root, "metadata"))
        import json
        with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as f:
            json.dump({"format-version": 2, "location": root,
                       "snapshots": []}, f)
        assert plan_files(root) == []


class TestEncodeIceberg:
    def test_end_to_end(self, spark, tmp_path):
        """Tokens-shaped Iceberg table → plan → file-granular encode →
        decode → exact roundtrip (the north-star input path)."""
        from pyspark.sql import functions as F

        from tokenc.datagen import TOKENS_ARROW_SCHEMA, synth_tokens_df
        from tokenc.engine import decode_df
        from tokenc.schema import specs_from_arrow_schema

        root = str(tmp_path / "tokens_tbl")
        data = os.path.join(root, "data")
        synth_tokens_df(spark, 2000, seed=11, partitions=4) \
            .write.mode("overwrite").parquet(data)
        files = sorted(os.path.join(data, f) for f in os.listdir(data)
                       if f.endswith(".parquet"))
        build_table(root, files)

        specs = specs_from_arrow_schema(TOKENS_ARROW_SCHEMA)
        enc = encode_iceberg(spark, root, specs, target_raw_bytes=1 << 20)
        dec = decode_df(enc, specs, TOKENS_ARROW_SCHEMA)
        got = (dec.select("doc_id", F.hash("tokens").alias("h"), "n_tok",
                          "source").orderBy("doc_id").toPandas())
        want = (spark.read.parquet(data)
                .select("doc_id", F.hash("tokens").alias("h"), "n_tok",
                        "source").orderBy("doc_id").toPandas())
        import pandas as pd
        pd.testing.assert_frame_equal(got, want)

    def test_snapshot_reproducibility(self, spark, table_dir):
        root, (f1, f2) = table_dir
        m1 = build_table(root, [f1])
        build_table(root, [f2], snapshot_id=2, parent=m1)
        a = [d.path for d in plan_files(root, snapshot_id=1)]
        b = [d.path for d in plan_files(root, snapshot_id=1)]
        assert a == b and len(a) == 1
