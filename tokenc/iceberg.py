"""Apache Iceberg table front door — metadata walk + scan planning, from
the public Iceberg table-spec (no external libraries; manifests decode via
tokenc.avro, a from-scratch Avro OCF codec).

The north-star input is "an Iceberg table of pre-tokenized training
sequences": an Iceberg table IS a parquet file set plus a metadata tree
(version-hint → vN.metadata.json → snapshot → manifest-list.avro →
manifest.avro → data files). `plan_files` walks that tree exactly the way
an engine's scan planner does — driver-side, metadata-only, a few KB per
manifest — and yields the parquet data-file paths that
`tokenc.files.encode_files` distributes to tasks. Snapshot selection gives
reproducible reads (encode the same snapshot twice → identical input), the
engine-side analog of the reference opening a fixed file set
(reader/reader.go:41-89).

`build_table` materializes a minimal spec-v2 table (metadata JSON +
manifest-list + manifest Avro) over existing parquet files: the test
fixture generator, and a way to publish an encoded output directory as an
Iceberg-readable table (commit = atomic metadata-version bump — the same
last-writer-wins manifest commit tokenc.manifest uses).
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass

from .avro import read_ocf, write_ocf
from .files import resolve_fs


@dataclass(frozen=True)
class DataFile:
    path: str
    file_format: str
    record_count: int
    file_size_in_bytes: int


def _strip_scheme(p: str) -> str:
    return p[len("file://"):] if p.startswith("file://") else p


def _read_file(fs, path: str) -> bytes:
    with fs.open_input_stream(path) as f:
        return f.read()


def table_metadata(table_dir: str, filesystem=None) -> dict:
    """Resolve the CURRENT metadata JSON: version-hint.text if present,
    else the highest vN.metadata.json, else the lexicographically last
    *.metadata.json (uuid-named metadata from object-store layouts)."""
    from pyarrow import fs as pafs

    fs, root = resolve_fs(table_dir, filesystem)
    meta_dir = root.rstrip("/") + "/metadata"
    hint = meta_dir + "/version-hint.text"
    if fs.get_file_info(hint).type == pafs.FileType.File:
        v = int(_read_file(fs, hint).decode().strip())
        return json.loads(_read_file(fs, f"{meta_dir}/v{v}.metadata.json"))
    infos = fs.get_file_info(pafs.FileSelector(meta_dir))
    cands = [i.path for i in infos if i.path.endswith(".metadata.json")]
    if not cands:
        raise FileNotFoundError(f"no metadata json under {meta_dir}")
    versioned = [(int(m.group(1)), p) for p in cands
                 if (m := re.search(r"/v(\d+)\.metadata\.json$", p))]
    pick = max(versioned)[1] if versioned else sorted(cands)[-1]
    return json.loads(_read_file(fs, pick))


def _snapshot(meta: dict, snapshot_id: int | None):
    snaps = meta.get("snapshots", [])
    if snapshot_id is None:
        snapshot_id = meta.get("current-snapshot-id")
        if snapshot_id in (None, -1):
            return None  # empty table: no snapshot yet
    for s in snaps:
        if s["snapshot-id"] == snapshot_id:
            return s
    raise ValueError(f"snapshot {snapshot_id} not in table metadata")


def _resolve(meta_location: str, path: str, table_dir: str) -> str:
    """Metadata stores absolute URIs under the table's own location;
    re-root them onto table_dir so a moved/copied table still resolves
    (pyiceberg does the same location-relative rewrite)."""
    p = _strip_scheme(path)
    loc = _strip_scheme(meta_location).rstrip("/")
    if loc and p.startswith(loc + "/"):
        return table_dir.rstrip("/") + p[len(loc):]
    return p


def plan_files(table_dir: str, snapshot_id: int | None = None,
               filesystem=None) -> list[DataFile]:
    """Scan-plan a snapshot → live parquet DataFiles (status ≠ DELETED,
    content = data). Metadata-only: reads the manifest-list plus each data
    manifest once, on the driver."""
    fs, root = resolve_fs(table_dir, filesystem)
    meta = table_metadata(table_dir, filesystem)
    snap = _snapshot(meta, snapshot_id)
    if snap is None:
        return []
    loc = meta.get("location", "")
    mlist_path = _resolve(loc, snap["manifest-list"], root)
    _, manifests = read_ocf(_read_file(fs, mlist_path))
    out: list[DataFile] = []
    for m in manifests:
        if m.get("content", 0) != 0:  # 1 = delete manifests (v2)
            continue
        mpath = _resolve(loc, m["manifest_path"], root)
        _, entries = read_ocf(_read_file(fs, mpath))
        for e in entries:
            if e["status"] == 2:  # DELETED
                continue
            df = e["data_file"]
            if df.get("content", 0) != 0:  # 1/2 = delete files (v2)
                continue
            out.append(DataFile(
                path=_resolve(loc, df["file_path"], root),
                file_format=str(df.get("file_format", "PARQUET")).upper(),
                record_count=int(df["record_count"]),
                file_size_in_bytes=int(df.get("file_size_in_bytes", 0))))
    bad = [d for d in out if d.file_format != "PARQUET"]
    if bad:
        raise ValueError(f"non-parquet data files in snapshot: {bad[:3]}")
    return sorted(out, key=lambda d: d.path)


def encode_iceberg(spark, table_dir: str, specs, *, snapshot_id=None,
                   filesystem=None, **encode_kwargs):
    """Iceberg front door for the file-granular encoder: plan the snapshot,
    hand the parquet file list to encode_files (one task per file unit,
    shuffle-free — see tokenc/files.py)."""
    from .files import encode_files

    plan = plan_files(table_dir, snapshot_id, filesystem)
    if not plan:
        raise ValueError(f"snapshot has no data files: {table_dir}")
    return encode_files(spark, [d.path for d in plan], specs,
                        filesystem=filesystem, **encode_kwargs)


# --------------------------------------------------------------------------
# minimal spec-v2 table builder (fixtures + publishing encoded output)
# --------------------------------------------------------------------------

_PARTITION = {"type": "record", "name": "r102", "fields": []}

_DATA_FILE = {
    "type": "record", "name": "r2", "fields": [
        {"name": "content", "type": "int", "field-id": 134},
        {"name": "file_path", "type": "string", "field-id": 100},
        {"name": "file_format", "type": "string", "field-id": 101},
        {"name": "partition", "type": _PARTITION, "field-id": 102},
        {"name": "record_count", "type": "long", "field-id": 103},
        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
    ]}

MANIFEST_ENTRY_SCHEMA = {
    "type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "default": None,
         "field-id": 1},
        {"name": "sequence_number", "type": ["null", "long"],
         "default": None, "field-id": 3},
        {"name": "file_sequence_number", "type": ["null", "long"],
         "default": None, "field-id": 4},
        {"name": "data_file", "type": _DATA_FILE, "field-id": 2},
    ]}

MANIFEST_FILE_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ]}


def build_table(table_dir: str, data_files: list[str], *,
                snapshot_id: int = 1, parent: dict | None = None,
                codec: str = "deflate") -> dict:
    """Create/append a spec-v2 metadata tree over existing LOCAL parquet
    files (one manifest per snapshot; unpartitioned spec). Returns the new
    metadata dict. Appending: pass the previous metadata as `parent` — the
    new snapshot's manifest list carries all prior manifests (EXISTING)
    plus the new one, and the metadata version bumps atomically
    (write-temp + rename, like tokenc.manifest's commit marker)."""
    import pyarrow.parquet as pq

    root = os.path.abspath(table_dir)
    meta_dir = os.path.join(root, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    seq = snapshot_id

    entries = []
    n_rows = 0
    for p in data_files:
        ap = os.path.abspath(p)
        md = pq.read_metadata(ap)
        n_rows += md.num_rows
        entries.append({
            "status": 1, "snapshot_id": snapshot_id,
            "sequence_number": None, "file_sequence_number": None,
            "data_file": {
                "content": 0, "file_path": "file://" + ap,
                "file_format": "PARQUET", "partition": {},
                "record_count": md.num_rows,
                "file_size_in_bytes": os.path.getsize(ap)}})
    mpath = os.path.join(meta_dir, f"snap{snapshot_id}-m0.avro")
    blob = write_ocf(MANIFEST_ENTRY_SCHEMA, entries, codec=codec,
                     metadata={"format-version": b"2", "content": b"data"})
    with open(mpath, "wb") as f:
        f.write(blob)

    prior = []
    if parent is not None:
        prev_snap = _snapshot(parent, None)
        if prev_snap is not None:
            _, prior = read_ocf(_read_file(
                resolve_fs(root)[0],
                _resolve(parent.get("location", ""),
                         prev_snap["manifest-list"], root)))
    mrec = {"manifest_path": "file://" + mpath,
            "manifest_length": len(blob), "partition_spec_id": 0,
            "content": 0, "sequence_number": seq, "min_sequence_number": seq,
            "added_snapshot_id": snapshot_id,
            "added_files_count": len(entries), "existing_files_count": 0,
            "deleted_files_count": 0, "added_rows_count": n_rows,
            "existing_rows_count": 0, "deleted_rows_count": 0}
    mlist_path = os.path.join(meta_dir, f"snap-{snapshot_id}-1.avro")
    with open(mlist_path, "wb") as f:
        f.write(write_ocf(MANIFEST_FILE_SCHEMA, [mrec] + prior, codec=codec))

    have = [int(m.group(1)) for p in os.listdir(meta_dir)
            if (m := re.match(r"v(\d+)\.metadata\.json$", p))]
    version = max(have, default=0) + 1
    meta = {
        "format-version": 2, "table-uuid": "0" * 8, "location": root,
        "last-sequence-number": seq, "last-updated-ms": 0,
        "last-column-id": 1, "current-schema-id": 0,
        "schemas": [{"type": "struct", "schema-id": 0, "fields": []}],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999, "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "current-snapshot-id": snapshot_id,
        "snapshots": (parent.get("snapshots", []) if parent else []) + [{
            "snapshot-id": snapshot_id,
            "sequence-number": seq, "timestamp-ms": 0,
            "manifest-list": "file://" + mlist_path,
            "summary": {"operation": "append"}}],
    }
    tmp = os.path.join(meta_dir, f".v{version}.metadata.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(meta_dir, f"v{version}.metadata.json"))
    with open(os.path.join(meta_dir, ".version-hint.tmp"), "w") as f:
        f.write(str(version))
    os.replace(os.path.join(meta_dir, ".version-hint.tmp"),
               os.path.join(meta_dir, "version-hint.text"))
    return meta
