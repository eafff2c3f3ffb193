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
    if path.startswith("webhdfs://"):
        # hdfs over the public WebHDFS REST gateway (tokenc/webhdfs.py) —
        # no libhdfs needed; webhdfs://host:port/a/b → endpoint host:port,
        # fs-relative path a/b. `user.name` rides as user@ if present.
        from .webhdfs import webhdfs_fs

        rest = path[len("webhdfs://"):]
        auth, _, rel = rest.partition("/")
        user, _, endpoint = auth.rpartition("@")
        return webhdfs_fs(endpoint, user or None), rel
    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def _list_fs(path: str | list[str], filesystem=None, suffix=".parquet"):
    """→ (filesystem, sorted fs-relative data-file paths with `suffix`)."""
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
                      and i.path.endswith(suffix))


def list_parquet_files(path: str, filesystem=None) -> list[str]:
    """Deterministic (sorted) data-file listing — the 'manifest read'.
    Accepts plain paths, file:// URIs, and any pyarrow-resolvable remote
    scheme (fs-relative paths are returned for those; pair with the
    filesystem from `resolve_fs`)."""
    return _list_fs(path, filesystem)[1]


def _pa_of_spec(spec: ColumnSpec):
    """Arrow type an all-null fill column must carry for `spec` (columns
    ADDED by schema evolution, absent from older data files)."""
    from . import codecs

    phys_pa = {codecs.PHYS_INT32: pa.int32(), codecs.PHYS_INT64: pa.int64(),
               codecs.PHYS_FLOAT: pa.float32(),
               codecs.PHYS_DOUBLE: pa.float64(),
               codecs.PHYS_BOOL: pa.bool_(),
               codecs.PHYS_BYTE_ARRAY: pa.string()}
    if spec.is_list:
        return pa.list_(spec.arrow_type or phys_pa[spec.phys])
    return spec.arrow_type or phys_pa[spec.phys]


def _file_field_ids(aschema: pa.Schema) -> dict:
    """field id → column name from the file's PARQUET:field_id metadata
    (files written by Iceberg writers carry it; ours may not — then the
    name-mapping candidates decide)."""
    out = {}
    for f in aschema:
        v = (f.metadata or {}).get(b"PARQUET:field_id")
        if v is not None:
            try:
                out[int(v)] = f.name
            except ValueError:
                pass
    return out


def _resolve_read(aschema: pa.Schema, wanted: list[str],
                  column_resolution: dict | None) -> dict:
    """Current-schema column name → this FILE's column name (or None when
    the file predates the column): parquet field id first, then the
    name-mapping candidates, then the bare name (no-resolution legacy)."""
    present = set(aschema.names)
    fid2name = _file_field_ids(aschema) if column_resolution else {}
    out = {}
    for w in wanted:
        res = (column_resolution or {}).get(w)
        if res is None:
            out[w] = w
            continue
        fn = fid2name.get(res["field_id"])
        if fn is None and not fid2name:
            # Iceberg column-projection rule: name mapping applies only
            # to files WITHOUT field ids (imported/legacy). A file that
            # carries ids but lacks this one predates the column — read
            # it as null, never by name (a dropped-then-re-added column
            # would otherwise resurrect the OLD column's values)
            fn = next((c for c in res["names"] if c in present), None)
        out[w] = fn
    return out
    # (with column_resolution None the bare name passes through even when
    # absent — pyarrow then raises loudly, the pre-evolution behavior)


def _load_eq_tables(fs, equality_deletes, unit_seq: int, cache: dict):
    """Equality-delete tables applicable to a data file of sequence number
    `unit_seq` (strictly-less rule), columns renamed to CURRENT schema
    names and deduped. Delete parquets are small (a list of key values);
    cached per task."""
    import pyarrow.parquet as pq

    out = []
    for d in equality_deletes:
        if d["seq"] <= unit_seq:
            continue  # applies only to STRICTLY older data files
        if d["path"] not in cache:
            t = pq.read_table(d["path"], filesystem=fs)
            arrays = []
            for cur, cands in zip(d["cols"], d["cands"]):
                fn = next((c for c in cands if c in t.column_names), None)
                if fn is None:
                    raise ValueError(f"equality-delete file {d['path']} "
                                     f"has no column for {cur!r} "
                                     f"(candidates {cands})")
                arrays.append(t[fn])
            tt = pa.Table.from_arrays(arrays, names=list(d["cols"]))
            cache[d["path"]] = tt.group_by(list(d["cols"])).aggregate([])
        out.append(cache[d["path"]])
    return out


def _null_fill_pair(arr):
    """(null-filled array, is-null flags) — the null-safe join key pair.
    pa.Table.join never matches null keys, but the Iceberg spec's
    equality-delete comparison treats null as EQUAL to null; joining on
    (filled value, null flag) gives exactly that."""
    import pyarrow.compute as pc

    t = arr.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        z = ""
    elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
        z = b""
    elif pa.types.is_boolean(t):
        z = False
    else:
        z = pa.scalar(0, type=t)  # numeric / temporal / decimal zero
    return pc.fill_null(arr, z), pc.is_null(arr)


def _eq_keep_mask(rb: pa.RecordBatch, eq_tables) -> "object":
    """Boolean keep-mask over `rb` (columns already in current-schema
    names): a row is dropped when ANY applicable equality-delete table
    contains its key, null keys matching null (the spec's equality —
    Java's StructLikeSet is null-safe). Vectorized: pc.is_in (whose
    default null_matching already matches null→null) for single-column
    keys; for composite keys an index-tagged inner join on null-safe
    (filled value, null flag) pairs (order untouched — the join output
    only marks indexes)."""
    import numpy as np
    import pyarrow.compute as pc

    keep = np.ones(rb.num_rows, dtype=bool)
    for dt in eq_tables:
        cols = dt.column_names
        if len(cols) == 1:
            m = pc.is_in(rb.column(rb.schema.names.index(cols[0])),
                         value_set=dt[cols[0]].combine_chunks())
            keep &= ~m.fill_null(False).to_numpy(zero_copy_only=False)
        else:
            b_cols, d_cols = {}, {}
            for c in cols:
                fv, nf = _null_fill_pair(
                    rb.column(rb.schema.names.index(c)))
                b_cols[c] = fv
                b_cols[c + "\x00n"] = nf
                fv, nf = _null_fill_pair(dt[c].combine_chunks())
                d_cols[c] = fv
                d_cols[c + "\x00n"] = nf
            bt = pa.table({
                **b_cols,
                "__idx": pa.array(np.arange(rb.num_rows, dtype=np.int64))})
            j = bt.join(pa.table(d_cols), keys=list(d_cols),
                        join_type="inner")
            if j.num_rows:
                keep[j["__idx"].to_numpy()] = False
    return keep


def _load_delete_positions(path: str, fs, delete_files, key: str = ""):
    """Sorted row positions deleted from `path`, merged across the
    snapshot's position-delete parquet files. Runs inside the task: each
    delete file is read WITH a file_path filter (parquet row-group/page
    pruning applies), so a task touches only its own file's delete rows —
    the merge-on-read join, distributed. `key` is the manifest's verbatim
    file_path URI (delete rows are written with it — a moved/re-rooted
    table must still match)."""
    import numpy as np
    import pyarrow.parquet as pq

    keys = list(dict.fromkeys([path, "file://" + path] + ([key] if key
                                                          else [])))
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
                 delete_files: list[str] | None = None,
                 equality_deletes: list[dict] | None = None,
                 file_seqs: list[int] | None = None,
                 file_keys: list[str] | None = None,
                 column_resolution: dict | None = None):
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

    `equality_deletes` are Iceberg v2 equality-delete descriptors
    ({path, seq, cols, cands}, from tokenc.iceberg.encode_iceberg): each
    task anti-matches its rows against the delete tables whose sequence
    number exceeds the file's (`file_seqs`, aligned with the resolved file
    list) — the merge-on-read anti-join, distributed, vectorized
    (pc.is_in / index-tagged join), no driver-side row data.

    `column_resolution` ({current_name: {field_id, names}}, from
    tokenc.iceberg.read_resolution) resolves each file's columns across
    schema evolution: parquet field ids first, then name-mapping
    candidates; a column absent from a file reads as typed nulls. Without
    it, columns resolve by bare name exactly as before.
    """
    fs, files = _list_fs(src_path, filesystem)
    if not files:
        raise ValueError(f"no parquet files under {src_path}")
    if file_seqs is not None and len(file_seqs) != len(files):
        raise ValueError("file_seqs must align 1:1 with the resolved files")
    if file_keys is not None and len(file_keys) != len(files):
        raise ValueError("file_keys must align 1:1 with the resolved files")
    cols = [s.name for s in specs]
    spec_by = {s.name: s for s in specs}
    out_schema = encoded_schema(specs)

    units = []  # (file_idx, path, split_idx, n_splits, seq, key)
    for i, p in enumerate(files):
        seq = int(file_seqs[i]) if file_seqs is not None else 0
        key = file_keys[i] if file_keys is not None else ""
        for s in range(tasks_per_file):
            units.append((i, p, s, tasks_per_file, seq, key))
    # several units per task (~3 waves/core): per-task fixed costs — python
    # worker turnaround and, above all, the selector's measured refinement
    # (fresh memo per task) — amortize across that task's files. rg_part/
    # rg_idx derive from the UNIT, so output ordering is task-layout-free.
    if n_tasks is None:
        n_tasks = max(1, min(len(units),
                             spark.sparkContext.defaultParallelism * 3))
    fdf = spark.createDataFrame(
        units,
        "file_idx int, path string, split_idx int, n_splits int, "
        "seq long, key string"
    ).repartition(n_tasks)

    def encode_fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.parquet as pq

        from .selector import WORKER_MEMO as sel_cache  # per-WORKER memo
        eq_cache: dict = {}  # delete parquet path → deduped current-name table
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
                dels = (_load_delete_positions(unit["path"], fs,
                                               delete_files, unit["key"])
                        if delete_files else None)
                eq_tables = (_load_eq_tables(fs, equality_deletes,
                                             unit["seq"], eq_cache)
                             if equality_deletes else [])
                eq_cols = list(dict.fromkeys(
                    c for t in eq_tables for c in t.column_names))
                wanted = cols + [c for c in eq_cols if c not in cols]
                read_map = _resolve_read(pf.schema_arrow, wanted,
                                         column_resolution)
                # an equality column this file predates reads all-null
                # here; spec equality matches null TO null, so the table
                # still applies through delete rows whose key is null in
                # every missing column — droppable only when some missing
                # column has no null keys at all (then nothing can match)
                eq_tables = [t for t in eq_tables
                             if all(read_map[c] is not None
                                    or t[c].null_count > 0
                                    for c in t.column_names)]
                eq_type = {c: t.schema.field(c).type
                           for t in eq_tables for c in t.column_names}
                wanted = cols + [c for c in eq_cols
                                 if c not in cols and any(
                                     c in t.column_names for t in eq_tables)]
                remap = (bool(eq_tables) or wanted != cols
                         or any(read_map[w] != w for w in cols))
                read_cols = (cols if not remap else list(dict.fromkeys(
                    v for w in wanted if (v := read_map[w]) is not None)))
                if remap and not read_cols:
                    # every wanted column postdates this file: read one
                    # physical column purely to carry the row count
                    read_cols = [pf.schema_arrow.names[0]]

                def remap_batch(rb: pa.RecordBatch) -> pa.RecordBatch:
                    arrays = []
                    for w in wanted:
                        fn = read_map[w]
                        arrays.append(
                            pa.nulls(rb.num_rows,
                                     _pa_of_spec(spec_by[w])
                                     if w in spec_by else eq_type[w])
                            if fn is None else
                            rb.column(rb.schema.names.index(fn)))
                    rb2 = pa.RecordBatch.from_arrays(arrays, names=wanted)
                    if eq_tables:
                        keep = _eq_keep_mask(rb2, eq_tables)
                        if not keep.all():
                            rb2 = rb2.filter(pa.array(keep))
                    return rb2.select(cols) if wanted != cols else rb2
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
                                          row_groups=rgs, columns=read_cols):
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
                    if remap:
                        rb = remap_batch(rb)
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
