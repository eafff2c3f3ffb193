#!/usr/bin/env python
"""Single-node head-to-head: pyarrow C++ parquet writer (same encodings:
DELTA_BINARY_PACKED / DELTA_BYTE_ARRAY + zstd) on the same tokens slice.
Stands in for the Go reference (no Go toolchain in this sandbox); arrow C++
is generally FASTER than parquet-go, so beating it bounds the reference."""
import sys, time, glob
sys.path.insert(0,"/root/repo")
import pyarrow as pa, pyarrow.parquet as pq

files = sorted(glob.glob("/dev/shm/tokenc_ws_src_1000000/*.parquet"))
if not files:
    print("no source; regenerate"); sys.exit(1)
# ~500MB slice of the 1M-doc source
tbl = pa.concat_tables([pq.read_table(f) for f in files[:48]]).combine_chunks()
raw = tbl.nbytes
print(f"table: {tbl.num_rows} rows, {raw/1e6:.0f} MB raw")

enc_cfg = dict(
    use_dictionary=False,
    column_encoding={"tokens": "DELTA_BINARY_PACKED", "n_tok": "DELTA_BINARY_PACKED",
                     "doc_id": "DELTA_BYTE_ARRAY", "source": "PLAIN"},
    compression="zstd",
)
for threads, label in ((1, "1 thread"), (32, "32 threads")):
    pa.set_cpu_count(threads); pa.set_io_thread_count(threads)
    best_w = 1e9; best_r = 1e9
    for _ in range(3):
        t0=time.time()
        pq.write_table(tbl, "/dev/shm/pa_cmp.parquet", **enc_cfg)
        best_w = min(best_w, time.time()-t0)
        t0=time.time()
        pq.read_table("/dev/shm/pa_cmp.parquet")
        best_r = min(best_r, time.time()-t0)
    import os
    print(f"pyarrow C++ [{label}]: write {raw/best_w/1e6:6.0f} MB/s  read {raw/best_r/1e6:6.0f} MB/s  size {os.path.getsize('/dev/shm/pa_cmp.parquet')/1e6:.0f} MB")
