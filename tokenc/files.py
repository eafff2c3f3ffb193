"""File-granular encode path: tasks read Parquet data files directly with
pyarrow inside `mapInArrow` — no JVM row materialization anywhere.

Why this exists: Spark's Python boundary converts InternalRows to Arrow one
field at a time. For wide token arrays (512 int32 elements/row) that pivot
costs far more than the encode kernels themselves and saturates a single
box's memory bus near ~250 MB/s regardless of core count (measured; see
BENCH/BASELINE.md). Feeding the encoder from pyarrow file reads keeps the
whole hot path columnar: parquet page → Arrow buffer → numpy view → encoded
blob. Encoded-row OUTPUT still crosses the boundary, but a row group is one
binary value per column — per-row pivot cost, not per-element.

This is the production-shaped path: an Iceberg table of pre-tokenized
sequences IS a set of parquet data files; distributing files (or row-group
splits) to tasks is exactly what Spark's own DataSource does. The reference
reads its own files the same way (reader/reader.go:41-89 footer → column
chunks), it just isn't distributed.

The DataFrame path (`engine.encode_df`) remains the general API for inputs
that only exist as DataFrames (joins, filters, streaming epochs).
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa

from .engine import (INVARIANT_SCHEMA, _blob_views, _encode_rowgroup,
                     _invariant_rows, _rebuild, encoded_schema,
                     from_arrow_schema)
from .chunk import decode_chunk
from .schema import ColumnSpec

DEFAULT_BATCH_ROWS = 8192


def resolve_fs(path: str, filesystem=None):
    """URI/path → (pyarrow FileSystem, fs-relative path).

    Plain paths and file:// map to LocalFileSystem; any other scheme
    (s3://, hdfs://, gcs://, …) resolves through
    `pyarrow.fs.FileSystem.from_uri` — the reference's pluggable
    ParquetFile source matrix (source/source.go:9-26; README
    local/HDFS/S3/GCS). The resolved filesystem object is resolved ONCE on
    the driver and pickled into the task closures (pyarrow filesystems,
    including S3FileSystem with endpoint/credential overrides, survive
    pickling), so executors never re-resolve credentials.
    """
    from pyarrow import fs as pafs

    if filesystem is not None:
        return filesystem, path
    if path.startswith("file://"):
        return pafs.LocalFileSystem(), (path[len("file://"):] or "/")
    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def _list_fs(path: str | list[str], filesystem=None):
    """→ (filesystem, sorted fs-relative .parquet paths)."""
    from pyarrow import fs as pafs

    if isinstance(path, (list, tuple)):
        if not path:
            return filesystem or pafs.LocalFileSystem(), []
        fs, first = resolve_fs(path[0], filesystem)
        rest = [resolve_fs(p, filesystem)[1] if filesystem is None else p
                for p in path[1:]]
        return fs, [first] + rest
    fs, p = resolve_fs(path, filesystem)
    info = fs.get_file_info(p)
    if info.type == pafs.FileType.File:
        return fs, [p]
    if info.type == pafs.FileType.NotFound:
        return fs, []
    sel = pafs.FileSelector(p, recursive=True)
    return fs, sorted(i.path for i in fs.get_file_info(sel)
                      if i.type == pafs.FileType.File
                      and i.path.endswith(".parquet"))


def list_parquet_files(path: str, filesystem=None) -> list[str]:
    """Deterministic (sorted) data-file listing — the 'manifest read'.
    Accepts plain paths, file:// URIs, and any pyarrow-resolvable remote
    scheme (fs-relative paths are returned for those; pair with the
    filesystem from `resolve_fs`)."""
    return _list_fs(path, filesystem)[1]


def _load_delete_positions(path: str, fs, delete_files):
    """Sorted row positions deleted from `path`, merged across the
    snapshot's position-delete parquet files. Runs inside the task: each
    delete file is read WITH a file_path filter (parquet row-group/page
    pruning applies), so a task touches only its own file's delete rows —
    the merge-on-read join, distributed."""
    import numpy as np
    import pyarrow.parquet as pq

    keys = [path, "file://" + path]
    parts = []
    for dp in delete_files:
        t = pq.read_table(dp, filesystem=fs, columns=["pos"],
                          filters=[("file_path", "in", keys)])
        if t.num_rows:
            parts.append(t.column("pos").to_numpy())
    if not parts:
        return None
    return np.unique(np.concatenate(parts))


def encode_files(spark, src_path: str | list[str], specs: list[ColumnSpec], *,
                 target_raw_bytes: int = 32 << 20,
                 tasks_per_file: int = 1,
                 n_tasks: int | None = None,
                 filesystem=None,
                 delete_files: list[str] | None = None):
    """Encode the parquet files under `src_path` → encoded row-group DF.

    Each task owns an ordered slice of (file, row-group-range): rg_part is
    the global file index and rg_idx is the flush's STARTING ROW OFFSET
    within the file, so (rg_part, rg_idx) orders rows by exact file position
    for read_range even when a parquet row group spans multiple flushes or
    `tasks_per_file` splits one file across tasks. Splits own CONTIGUOUS
    parquet row-group ranges (balance without a shuffle, order preserved).

    `delete_files` are Iceberg-style position-delete parquet paths
    (file_path, pos): each task masks its own file's deleted row positions
    before encoding (rg_idx stays the PRE-delete file offset — still a
    total order).
    """
    fs, files = _list_fs(src_path, filesystem)
    if not files:
        raise ValueError(f"no parquet files under {src_path}")
    cols = [s.name for s in specs]
    out_schema = encoded_schema(specs)

    units = []  # (file_idx, path, split_idx, n_splits)
    for i, p in enumerate(files):
        for s in range(tasks_per_file):
            units.append((i, p, s, tasks_per_file))
    # several units per task (~3 waves/core): per-task fixed costs — python
    # worker turnaround and, above all, the selector's measured refinement
    # (fresh memo per task) — amortize across that task's files. rg_part/
    # rg_idx derive from the UNIT, so output ordering is task-layout-free.
    if n_tasks is None:
        n_tasks = max(1, min(len(units),
                             spark.sparkContext.defaultParallelism * 3))
    fdf = spark.createDataFrame(
        units, "file_idx int, path string, split_idx int, n_splits int"
    ).repartition(n_tasks)

    def encode_fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.parquet as pq

        from .selector import WORKER_MEMO as sel_cache  # per-WORKER memo
        for b in batches:
            for unit in b.to_pylist():
                pf = pq.ParquetFile(unit["path"], filesystem=fs)
                n_rg = pf.metadata.num_row_groups
                k, m = unit["split_idx"], unit["n_splits"]
                # contiguous balanced range of parquet row groups per split
                lo_rg, hi_rg = (k * n_rg) // m, ((k + 1) * n_rg) // m
                rgs = list(range(lo_rg, hi_rg))
                if not rgs:
                    continue
                dels = (_load_delete_positions(unit["path"], fs, delete_files)
                        if delete_files else None)
                # rg_idx = absolute starting row offset of the flush in the
                # file: a total file-position order no matter how parquet
                # row groups and flush boundaries interleave. With deletes
                # it stays the PRE-delete offset (offsets remain strictly
                # increasing, which is all the ordering contract needs).
                row_off = sum(pf.metadata.row_group(g).num_rows
                              for g in range(lo_rg))
                file_pos = row_off  # pre-delete read cursor
                buf: list[pa.RecordBatch] = []
                buf_bytes = 0
                buf_src_rows = 0

                def flush():
                    nonlocal buf, buf_bytes, buf_src_rows, row_off
                    if not buf:
                        return None
                    tbl = pa.Table.from_batches(buf)
                    if row_off > 0x7FFFFFFF:
                        raise ValueError("file exceeds 2^31 rows; rg_idx overflow")
                    start = row_off
                    row_off += buf_src_rows
                    buf = []
                    buf_bytes = 0
                    buf_src_rows = 0
                    if tbl.num_rows == 0:  # every buffered row deleted
                        return None
                    row = _encode_rowgroup(tbl, specs, sel_cache)
                    row["rg_part"] = unit["file_idx"]
                    row["rg_idx"] = start
                    return pa.RecordBatch.from_pylist([row], schema=out_schema)

                for rb in pf.iter_batches(batch_size=DEFAULT_BATCH_ROWS,
                                          row_groups=rgs, columns=cols):
                    n_src = rb.num_rows
                    if dels is not None and len(dels):
                        import numpy as np

                        lo = np.searchsorted(dels, file_pos)
                        hi = np.searchsorted(dels, file_pos + n_src)
                        if hi > lo:
                            mask = np.ones(n_src, dtype=bool)
                            mask[dels[lo:hi] - file_pos] = False
                            rb = rb.filter(pa.array(mask))
                    file_pos += n_src
                    buf.append(rb)
                    buf_bytes += rb.nbytes
                    buf_src_rows += n_src
                    if buf_bytes >= target_raw_bytes:
                        out = flush()
                        if out is not None:
                            yield out
                out = flush()
                if out is not None:
                    yield out

    return fdf.mapInArrow(encode_fn, from_arrow_schema(out_schema))


def _files_df(spark, enc_path: str | list[str], n_tasks: int | None = None,
              filesystem=None):
    """File list → one partition per task, several files per partition.
    Blob files are often small (one tokenc row group each); one task per
    file would drown useful work in task overhead, so default to ~3 waves
    per core and let each task stream its file subset."""
    fs, files = _list_fs(enc_path, filesystem)
    if not files:
        raise ValueError(f"no parquet files under {enc_path}")
    if n_tasks is None:
        n_tasks = max(1, min(len(files),
                             spark.sparkContext.defaultParallelism * 3))
    return fs, spark.createDataFrame([(p,) for p in files], "path string") \
        .repartition(n_tasks)


def decode_files(spark, enc_path: str | list[str], specs: list[ColumnSpec],
                 out_schema, *, batch_groups: int = 4,
                 n_tasks: int | None = None, filesystem=None):
    """File-granular decode: tasks read the encoded blob parquet directly
    with pyarrow — the read mirror of `encode_files`. The JVM never scans
    or ships the blob bytes; only the DECODED rows cross the Python→JVM
    boundary (unavoidable when the result must be a DataFrame of rows).
    """
    blob_cols = [f"{s.name}_blob" for s in specs]
    fs, fdf = _files_df(spark, enc_path, n_tasks, filesystem)
    # Spark has no FixedSizeBinary type: FLBA columns surface as plain
    # binary at the DataFrame boundary (exactly Spark's own FLBA-parquet
    # behavior); Arrow-native consumers use tokenc.local for the exact type
    out_schema = pa.schema([
        pa.field(f.name, pa.binary(), f.nullable)
        if pa.types.is_fixed_size_binary(f.type) else f
        for f in out_schema])

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.parquet as pq

        for b in batches:
            for unit in b.to_pylist():
                pf = pq.ParquetFile(unit["path"], filesystem=fs)
                for rb in pf.iter_batches(batch_size=batch_groups,
                                          columns=blob_cols):
                    tbl = pa.Table.from_batches([rb])
                    views = [_blob_views(tbl, c) for c in blob_cols]
                    cols = []
                    for j, spec in enumerate(specs):
                        arrs = [_rebuild(decode_chunk(v), spec)
                                for v in views[j]]
                        arr = (arrs[0] if len(arrs) == 1
                               else pa.concat_arrays(arrs))
                        if pa.types.is_fixed_size_binary(arr.type):
                            arr = arr.cast(pa.binary())
                        cols.append(arr)
                    yield pa.RecordBatch.from_arrays(cols, schema=out_schema)

    return fdf.mapInArrow(fn, from_arrow_schema(out_schema))


def decode_invariants_files(spark, enc_path: str | list[str],
                            specs: list[ColumnSpec], *,
                            batch_groups: int = 8,
                            n_tasks: int | None = None, filesystem=None):
    """File-granular decode_invariants: full decode compute inside tasks
    reading the blob parquet with pyarrow; only tiny invariant rows cross
    ANY process boundary. This is the headline decode path — like
    encode_files it keeps the whole hot loop columnar (parquet page →
    Arrow buffer → numpy view → decode kernels) with zero JVM involvement
    beyond task scheduling."""
    blob_cols = [f"{s.name}_blob" for s in specs]
    fs, fdf = _files_df(spark, enc_path, n_tasks, filesystem)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.parquet as pq

        for b in batches:
            for unit in b.to_pylist():
                pf = pq.ParquetFile(unit["path"], filesystem=fs)
                rows = []
                for rb in pf.iter_batches(batch_size=batch_groups,
                                          columns=blob_cols):
                    tbl = pa.Table.from_batches([rb])
                    views = [_blob_views(tbl, c) for c in blob_cols]
                    rows.extend(_invariant_rows(views, specs))
                if rows:
                    yield pa.RecordBatch.from_pylist(rows, schema=INVARIANT_SCHEMA)

    return fdf.mapInArrow(fn, from_arrow_schema(INVARIANT_SCHEMA))
