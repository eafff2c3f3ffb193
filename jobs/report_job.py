#!/usr/bin/env python
"""parquet-tools analog over a tokenc output dir
(reference: /root/reference/tool/parquet-tools/parquet-tools.go:26-145,
sizetool.go:9-65 — schema / rowcount / size / cat).

    spark-submit --py-files tokenc.zip jobs/report_job.py --data OUT/data \
        [--cmd schema|rowcount|size|cat] [--limit 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--cmd",
                   choices=["schema", "rowcount", "size", "cat", "verify"],
                   default="size")
    p.add_argument("--limit", type=int, default=10)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    from tokenc.datagen import TOKENS_ARROW_SCHEMA
    from tokenc.engine import decode_df
    from tokenc.schema import specs_from_arrow_schema

    spark = SparkSession.builder.appName("tokenc-report").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    enc = spark.read.parquet(args.data)
    blob_cols = [c[:-5] for c in enc.columns if c.endswith("_blob")]

    if args.cmd == "schema":
        out = {"row_groups_schema": enc.schema.simpleString(),
               "columns": blob_cols}
        print(json.dumps(out, indent=2))
    elif args.cmd == "rowcount":
        n = enc.agg(F.sum("n_rows")).collect()[0][0]
        print(json.dumps({"rows": int(n), "row_groups": enc.count()}))
    elif args.cmd == "size":
        # sizetool.go:23-39 semantics: compressed/uncompressed roll-up per column
        aggs = []
        for c in blob_cols:
            aggs += [F.sum(f"{c}_meta.raw_bytes").alias(f"{c}_raw"),
                     F.sum(f"{c}_meta.enc_bytes").alias(f"{c}_enc")]
        row = enc.agg(*aggs).collect()[0]
        out = {}
        for c in blob_cols:
            raw, encb = int(row[f"{c}_raw"]), int(row[f"{c}_enc"])
            out[c] = {"uncompressed": raw, "compressed": encb,
                      "ratio": round(raw / max(encb, 1), 3)}
        out["total"] = {
            "uncompressed": sum(v["uncompressed"] for v in out.values()),
            "compressed": sum(v["compressed"] for v in out.values()),
        }
        print(json.dumps(out, indent=2))
    elif args.cmd == "verify":
        # distributed bit-rot audit: recompute every chunk's CRC32 against
        # the manifest (engine.verify_table) — no decode, scan speed
        from tokenc.engine import verify_table

        bad = verify_table(enc, blob_cols).collect()
        print(json.dumps({
            "row_groups": enc.count(), "columns": blob_cols,
            "mismatches": [r.asDict() for r in bad],
            "ok": not bad,
        }, indent=2))
        if bad:
            sys.exit(1)
    else:  # cat
        import pyarrow as pa

        names = [n for n in blob_cols if TOKENS_ARROW_SCHEMA.get_field_index(n) >= 0]
        sub = pa.schema([TOKENS_ARROW_SCHEMA.field(n) for n in names])
        specs = specs_from_arrow_schema(sub)
        dec = decode_df(enc.select(*[f"{n}_blob" for n in names]), specs, sub)
        for r in dec.limit(args.limit).collect():
            print(json.dumps(r.asDict(), default=str))


if __name__ == "__main__":
    main()
