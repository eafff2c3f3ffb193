"""In-process (no-Spark) writer/reader over the same chunk format.

The reference is first a LIBRARY — a single process writes and reads its own
files (writer/writer.go:58-225, reader/reader.go:41-379). This module is
that mode for tokenc: a pyarrow Table in, an encoded directory out, and
back — bit-identical with what the Spark jobs produce and read, because both
go through the same `_encode_rowgroup`/`decode_chunk` kernels and the same
Parquet blob container. Useful for tools, tests, and small-data callers;
the Spark paths (engine.py, files.py) are the distributed mode.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .engine import _encode_rowgroup, _rebuild, encoded_schema
from .chunk import decode_chunk
from .schema import ColumnSpec, specs_from_arrow_schema


def write_table(table: pa.Table, out_dir: str, *,
                specs: list[ColumnSpec] | None = None,
                codec_overrides: dict[str, str] | None = None,
                compression: dict[str, str] | str | None = None,
                target_raw_bytes: int = 32 << 20) -> list[ColumnSpec]:
    """Encode a pyarrow Table into `out_dir` (one parquet of blob rows).

    Returns the specs used (pass them to read_table for schema-free reads).
    Note: codec=None in a returned spec means per-chunk auto-selection — the
    actual picks are recorded in each blob header and the manifest.
    """
    if specs is None:
        specs = specs_from_arrow_schema(table.schema, codec_overrides,
                                        compression)
    out_schema = encoded_schema(specs)
    rows = []
    n = table.num_rows
    rows_per = max(1, int(n * target_raw_bytes / max(table.nbytes, 1))) if n else n
    rg_idx = 0
    sel_cache: dict = {}
    for lo in range(0, n, rows_per or 1):
        part = table.slice(lo, rows_per)
        row = _encode_rowgroup(part.combine_chunks(), specs, sel_cache)
        row["rg_part"] = 0
        row["rg_idx"] = rg_idx
        rg_idx += 1
        rows.append(row)
    os.makedirs(out_dir, exist_ok=True)
    enc = pa.Table.from_pylist(rows, schema=out_schema)
    pq.write_table(enc, os.path.join(out_dir, "part-00000.parquet"),
                   compression="zstd")
    return specs


def read_table(path: str, specs: list[ColumnSpec], *,
               columns: list[str] | None = None,
               offset: int = 0, count: int | None = None) -> pa.Table:
    """Decode an encoded dir/file back to a pyarrow Table.

    `columns` prunes blob columns at the parquet scan (ReadPartial analog);
    `offset`/`count` skip whole row groups on their manifest counts before
    any decode (SkipRows analog, reader/reader.go:179-253).
    """
    sel = [s for s in specs if columns is None or s.name in columns]
    if columns is not None and len(sel) != len(columns):
        missing = set(columns) - {s.name for s in sel}
        raise ValueError(f"unknown columns {sorted(missing)}")
    files = ([os.path.join(path, f) for f in sorted(os.listdir(path))
              if f.endswith(".parquet")] if os.path.isdir(path) else [path])
    cols = ["rg_part", "rg_idx", "n_rows"] + [f"{s.name}_blob" for s in sel]
    enc = pa.concat_tables([pq.read_table(f, columns=cols) for f in files])
    order = np.lexsort((np.asarray(enc["rg_idx"]), np.asarray(enc["rg_part"])))
    n_rows = np.asarray(enc["n_rows"])[order]
    starts = np.zeros(order.size + 1, dtype=np.int64)
    np.cumsum(n_rows, out=starts[1:])
    total = int(starts[-1])
    lo = max(0, offset)
    hi = total if count is None else min(total, offset + count)
    batches = []
    for pos, i in enumerate(order):
        if starts[pos + 1] <= lo or starts[pos] >= hi:
            continue  # row group skipped without decoding
        arrays = [_rebuild(decode_chunk(enc[f"{s.name}_blob"][int(i)].as_py()), s)
                  for s in sel]
        rb = pa.Table.from_arrays(arrays, names=[s.name for s in sel])
        skip = max(0, lo - int(starts[pos]))
        take = min(int(starts[pos + 1]), hi) - max(int(starts[pos]), lo)
        batches.append(rb.slice(skip, take))
    if not batches:
        return pa.table({s.name: pa.array([], _rebuild_type(s)) for s in sel})
    return pa.concat_tables(batches)


def _rebuild_type(spec: ColumnSpec):
    from . import codecs as _c

    if spec.arrow_type is not None:
        # on LIST specs arrow_type is the element logical type
        return pa.list_(spec.arrow_type) if spec.is_list else spec.arrow_type
    base = {_c.PHYS_INT32: pa.int32(), _c.PHYS_INT64: pa.int64(),
            _c.PHYS_FLOAT: pa.float32(), _c.PHYS_DOUBLE: pa.float64(),
            _c.PHYS_BOOL: pa.bool_(), _c.PHYS_BYTE_ARRAY: pa.string()}[spec.phys]
    return pa.list_(base) if spec.is_list else base
