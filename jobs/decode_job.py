#!/usr/bin/env python
"""Distributed decode job: encoded row groups → original tokens table.

    spark-submit --py-files tokenc.zip jobs/decode_job.py \
        --data /tmp/tokenc_out/data --out /tmp/tokenc_decoded [--columns tokens,doc_id]

Shuffle-free: each row group decodes independently inside mapInArrow.
Column subset reads prune blob columns at the Parquet scan (projection
pushdown — the reference's ReadPartial, reader/reader.go:256-263).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--columns", default=None, help="comma list; default all")
    p.add_argument("--file-granular", action="store_true",
                   help="tasks read the blob parquet directly with pyarrow "
                        "(production decode path; no JVM blob transfer)")
    args = p.parse_args(argv)

    import pyarrow as pa
    from pyspark.sql import SparkSession

    from tokenc.datagen import TOKENS_ARROW_SCHEMA
    from tokenc.engine import decode_df
    from tokenc.schema import specs_from_arrow_schema

    spark = SparkSession.builder.appName("tokenc-decode").getOrCreate()
    names = ([c.strip() for c in args.columns.split(",") if c.strip()]
             if args.columns else [f.name for f in TOKENS_ARROW_SCHEMA])
    sub_schema = pa.schema([TOKENS_ARROW_SCHEMA.field(n) for n in names])
    specs = specs_from_arrow_schema(sub_schema)

    t0 = time.time()
    if args.file_granular:
        from tokenc.files import decode_files

        dec = decode_files(spark, args.data, specs, sub_schema)
    else:
        enc = spark.read.parquet(args.data).select(
            *[f"{n}_blob" for n in names])
        dec = decode_df(enc, specs, sub_schema)
    dec.write.mode("overwrite").parquet(args.out)
    print(json.dumps({"job": "decode", "wall_s": time.time() - t0, "columns": names}))


if __name__ == "__main__":
    main()
