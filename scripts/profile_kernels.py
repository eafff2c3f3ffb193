#!/usr/bin/env python
"""Single-thread profile of the bench hot paths, no Spark involved.

Mirrors exactly what one encode_files / decode_invariants_files task does:
pyarrow parquet read → _encode_rowgroup (selector + encode_chunk + stats)
and blob views → decode_chunk → invariant reduction. Prints a per-phase
wall breakdown plus cProfile top functions, so kernel work is attributable
before touching the Spark protocol numbers.

Usage: python scripts/profile_kernels.py [src_dir] [--files N] [--profile]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from tokenc import codecs, selector  # noqa: E402
from tokenc.chunk import encode_chunk, decode_chunk  # noqa: E402
from tokenc.datagen import TOKENS_ARROW_SCHEMA  # noqa: E402
from tokenc.engine import (_blob_views, _encode_rowgroup, _extract,  # noqa: E402
                           _invariant_rows, encoded_schema)
from tokenc.schema import specs_from_arrow_schema  # noqa: E402


def _buffers(pf_paths, target=8 << 20):
    """Yield ~target-byte pa.Tables the way encode_files buffers them."""
    for p in pf_paths:
        pf = pq.ParquetFile(p)
        buf, nb = [], 0
        for rb in pf.iter_batches(batch_size=16384):
            buf.append(rb)
            nb += rb.nbytes
            if nb >= target:
                yield pa.Table.from_batches(buf)
                buf, nb = [], 0
        if buf:
            yield pa.Table.from_batches(buf)


def _profile_pass(tables, specs, sel_cache, phase, col_t):
    for tbl in tables:
        for spec in specs:
            t0 = time.perf_counter()
            arr = tbl.column(spec.name).combine_chunks()
            parts = _extract(arr, spec)
            t1 = time.perf_counter()
            codec = spec.codec or selector.choose(
                spec.phys, values=parts.get("values"),
                ba_data=parts.get("ba_data"),
                ba_offsets=parts.get("ba_offsets"),
                cache=sel_cache, key=spec.name,
                container=spec.compression or "zstd")
            t2 = time.perf_counter()
            encode_chunk(phys=spec.phys, codec=codec, n_rows=tbl.num_rows,
                         omit_stats=spec.omit_stats,
                         compression=spec.compression, **parts)
            t3 = time.perf_counter()
            phase["extract"] += t1 - t0
            phase["select"] += t2 - t1
            phase["encode"] += t3 - t2
            col_t[spec.name] = col_t.get(spec.name, 0.0) + (t3 - t0)


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    src = argv[0] if argv else "/dev/shm/tokenc_ws_src_250000"
    n_files = int(argv[1]) if len(argv) > 1 else 4
    do_prof = "--profile" in sys.argv

    paths = sorted(os.path.join(src, f) for f in os.listdir(src)
                   if f.endswith(".parquet"))[:n_files]
    if not paths:
        raise SystemExit(f"no parquet under {src}")
    specs = specs_from_arrow_schema(TOKENS_ARROW_SCHEMA)
    raw = 0
    tables = []
    for t in _buffers(paths):
        tables.append(t)
        raw += t.nbytes
    print(f"{len(paths)} files, {len(tables)} row groups, "
          f"{raw/1e6:.0f} MB arrow")

    # ---- encode: per-column phase breakdown (2 passes, report the warm
    # one — selector measurement memoizes per column stream) -------------
    sel_cache: dict = {}
    for _pass in range(2):
        phase = {"extract": 0.0, "select": 0.0, "encode": 0.0, "stats": 0.0}
        col_t: dict[str, float] = {}
        _profile_pass(tables, specs, sel_cache, phase, col_t)
    tot = sum(phase.values())
    print(f"\nencode phases over {raw/1e6:.0f} MB "
          f"({raw/tot/1e6:.0f} MB/s single-thread):")
    for k, v in phase.items():
        print(f"  {k:8s} {v:7.3f} s  {100*v/tot:5.1f}%")
    print("  per column:", {k: round(v, 3) for k, v in col_t.items()})

    # ---- full _encode_rowgroup wall (includes bloom/distinct/sorted/crc)
    t0 = time.perf_counter()
    rows = [_encode_rowgroup(tbl, specs, sel_cache) for tbl in tables]
    t_full = time.perf_counter() - t0
    print(f"\n_encode_rowgroup total: {t_full:.3f} s "
          f"({raw/t_full/1e6:.0f} MB/s); kernel-only above was "
          f"{tot:.3f} s → stats/bloom/crc overhead "
          f"{100*(t_full-tot)/t_full:.0f}%")

    if do_prof:
        pr = cProfile.Profile()
        pr.enable()
        for tbl in tables:
            _encode_rowgroup(tbl, specs, sel_cache)
        pr.disable()
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
        print("\nencode cProfile:\n", s.getvalue())

    # ---- decode ---------------------------------------------------------
    out_schema = encoded_schema(specs)
    enc_tbl = pa.Table.from_pylist(rows, schema=out_schema)
    blob_cols = [f"{s.name}_blob" for s in specs]
    views = [_blob_views(enc_tbl, c) for c in blob_cols]
    t0 = time.perf_counter()
    _invariant_rows(views, specs)
    t_dec = time.perf_counter() - t0
    print(f"\ndecode+invariants: {t_dec:.3f} s ({raw/t_dec/1e6:.0f} MB/s "
          f"single-thread)")

    # per-column decode attribution
    dcol: dict[str, float] = {}
    for j, spec in enumerate(specs):
        t0 = time.perf_counter()
        for v in views[j]:
            decode_chunk(v)
        dcol[spec.name] = time.perf_counter() - t0
    print("  decode per column:", {k: round(v, 3) for k, v in dcol.items()})

    if do_prof:
        pr = cProfile.Profile()
        pr.enable()
        _invariant_rows(views, specs)
        pr.disable()
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
        print("\ndecode cProfile:\n", s.getvalue())


if __name__ == "__main__":
    main()
