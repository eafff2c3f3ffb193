#!/usr/bin/env python
"""Resumable distributed encode job.

    spark-submit --py-files tokenc.zip jobs/encode_job.py \
        --out /tmp/tokenc_out --mode synth --n-docs 100000 --slices 8

Modes:
  synth      deterministic synthetic tokens table (datagen.synth_tokens_df)
  documents  tokens derived from $SF_DIR/documents.parquet
  parquet    pre-tokenized parquet/Iceberg data dir (--src), encoded via the
             file-granular fast path (tokenc/files.py — tasks read parquet
             directly with pyarrow; no JVM row pivot). Slices = file ranges.

Each slice encodes independently and commits atomically (manifest + marker);
rerunning after a kill skips committed slices. Skew from long documents is
defused by (a) hash repartitioning and (b) raw-byte-bounded row groups — a
giant doc simply closes its row group early instead of stalling a task on a
monster chunk.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_slice_df(spark, args, k: int):
    from pyspark.sql import functions as F

    from tokenc.datagen import synth_tokens_df, tokens_from_documents

    if args.mode == "synth":
        per = (args.n_docs + args.slices - 1) // args.slices
        lo, hi = k * per, min((k + 1) * per, args.n_docs)
        # range-sliced at the generator: no wasted work, no filter
        return synth_tokens_df(spark, hi, seed=args.seed, mean_tokens=args.mean_tokens,
                               partitions=args.partitions, start=lo)
    df = tokens_from_documents(spark, args.sf_dir)
    # pmod, not abs(hash) % n: hash() can return Integer.MIN_VALUE, where
    # abs overflows under ANSI (job dies) or stays negative without it
    # (the row matches no slice and is silently lost)
    return df.filter(F.pmod(F.hash("doc_id"), F.lit(args.slices)) == k)


def build_slice_files(args, k: int) -> list[str]:
    """parquet mode: slice k owns every args.slices-th data file."""
    from tokenc.files import list_parquet_files

    return list_parquet_files(args.src)[k::args.slices]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--mode", choices=["synth", "documents", "parquet"], default="synth")
    p.add_argument("--src", default=None, help="parquet mode: data dir of the pre-tokenized table")
    p.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    p.add_argument("--n-docs", type=int, default=50_000)
    p.add_argument("--mean-tokens", type=int, default=512)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--slices", type=int, default=4)
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--target-raw-mb", type=int, default=32)
    p.add_argument("--codec-overrides", default=None, help='JSON like {"tokens":"delta_bp"}')
    p.add_argument("--fail-after-slice", type=int, default=-1,
                   help="test hook: die after committing this many slices")
    p.add_argument("--publish-iceberg", action="store_true",
                   help="after all slices commit, publish the encoded "
                        "output as a spec-v2 Iceberg table rooted at "
                        "--out (metadata/ + manifests over the slice "
                        "parquet files) — downstream scans plan snapshots "
                        "and prune on rg_part/rg_idx/n_rows bounds")
    p.add_argument("--publish-timestamp-ms", type=int, default=0,
                   help="snapshot-log timestamp for --publish-iceberg "
                        "(deterministic default; pass wall-clock ms for "
                        "production time travel)")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from tokenc import manifest as mf
    from tokenc.datagen import TOKENS_ARROW_SCHEMA
    from tokenc.engine import encode_df
    from tokenc.schema import specs_from_arrow_schema

    # container codec must match what the selector's measured refinement
    # ranks against (selector.choose container= default) — see selector.py
    spark = (SparkSession.builder.appName("tokenc-encode")
             .config("spark.sql.parquet.compression.codec", "zstd")
             .getOrCreate())
    overrides = json.loads(args.codec_overrides) if args.codec_overrides else None
    if args.mode == "parquet":
        # schema inferred from the data files themselves — the reference's
        # footer-derived schema (reader/reader.go:74) analog
        import pyarrow.parquet as pq

        from tokenc.files import list_parquet_files

        if not args.src:
            p.error("--mode parquet requires --src")
        schema = pq.ParquetFile(list_parquet_files(args.src)[0]).schema_arrow
        specs = specs_from_arrow_schema(schema, overrides)
    else:
        specs = specs_from_arrow_schema(TOKENS_ARROW_SCHEMA, overrides)
    cols = [s.name for s in specs]

    done = 0
    t_start = time.time()
    for k in range(args.slices):
        slice_files = build_slice_files(args, k) if args.mode == "parquet" else None
        if args.mode == "parquet" and not slice_files:
            # more slices than data files: the slice is legitimately empty
            print(f"slice {k}: no data files, skipping")
            continue
        fp = mf.fingerprint_input({
            "mode": args.mode, "sf_dir": args.sf_dir if args.mode == "documents" else None,
            "src_files": slice_files,
            "n_docs": args.n_docs, "seed": args.seed, "mean_tokens": args.mean_tokens,
            "slice": k, "slices": args.slices, "overrides": overrides,
            # pmod slice assignment (r5) partitions docs differently from
            # the old abs(hash)%n; the tag keeps a resumed pre-r5 output
            # from mixing the two assignments across slices
            "slice_fn": "pmod",
        })
        if mf.is_committed(args.out, k, fp):
            print(f"slice {k}: already committed, skipping")
            continue
        t0 = time.time()
        data_dir, man_dir, _ = mf.slice_paths(args.out, k)
        if args.mode == "parquet":
            from tokenc.files import encode_files

            enc = encode_files(spark, slice_files, specs,
                               target_raw_bytes=args.target_raw_mb << 20)
        else:
            df = build_slice_df(spark, args, k)
            enc = encode_df(df, specs, target_raw_bytes=args.target_raw_mb << 20,
                            partitions=args.partitions)
        enc.write.mode("overwrite").parquet(data_dir)
        enc_read = spark.read.parquet(data_dir)  # blob cols pruned away below
        man = mf.manifest_df(enc_read, cols)
        man.write.mode("overwrite").parquet(man_dir)
        row = man.groupBy().agg(
            {"raw_bytes": "sum", "enc_bytes": "sum", "n_rows": "sum"}).collect()[0]
        mf.commit_slice(args.out, k, fp,
                        raw_bytes=row["sum(raw_bytes)"], enc_bytes=row["sum(enc_bytes)"],
                        rows=row["sum(n_rows)"], wall_s=time.time() - t0)
        done += 1
        print(f"slice {k}: committed in {time.time()-t0:.1f}s "
              f"raw={row['sum(raw_bytes)']} enc={row['sum(enc_bytes)']}")
        if args.fail_after_slice >= 0 and done >= args.fail_after_slice:
            print("test hook: simulated crash")
            os._exit(137)
    if args.publish_iceberg:
        from tokenc.files import list_parquet_files
        from tokenc.iceberg import build_table

        data_files: list[str] = []
        for k in range(args.slices):
            data_dir, _, _ = mf.slice_paths(args.out, k)
            if os.path.isdir(data_dir):
                data_files += list_parquet_files(data_dir)
        meta = build_table(args.out, sorted(data_files),
                           timestamp_ms=args.publish_timestamp_ms)
        print(f"published iceberg table at {args.out}: "
              f"{len(data_files)} data files, "
              f"snapshot {meta['current-snapshot-id']}")
    print(json.dumps({"job": "encode", "slices": args.slices, "wall_s": time.time() - t_start}))


if __name__ == "__main__":
    main()
