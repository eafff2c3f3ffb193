#!/usr/bin/env python
"""Iceberg table maintenance job: compaction + snapshot expiry.

    spark-submit --py-files tokenc.zip jobs/compact_job.py \
        --table /path/to/iceberg_table --target-file-mb 128 \
        [--expire-keep-last 3] [--expire-older-than-ms T] [--dry-run]

Compaction (tokenc.iceberg.compact_table) bin-packs each partition's small
data files into ~target-size outputs, materializes position/equality
deletes while rewriting, and commits a REPLACE snapshot — one Spark task
per output file, no shuffle. Expiry (expire_snapshots) then reclaims the
files only expired history still references; without --expire-* the
pre-compaction snapshots stay time-travelable.

Prints ONE JSON report line (machine-readable, like the other jobs).
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
    p.add_argument("--table", required=True, help="Iceberg table directory")
    p.add_argument("--target-file-mb", type=int, default=128)
    p.add_argument("--timestamp-ms", type=int, default=0,
                   help="commit timestamp for the REPLACE snapshot "
                        "(deterministic default; pass wall-clock ms for "
                        "production time travel)")
    p.add_argument("--expire-keep-last", type=int, default=None,
                   help="after compacting, expire all but the newest N "
                        "snapshots and delete their orphaned files")
    p.add_argument("--expire-older-than-ms", type=int, default=None)
    p.add_argument("--dry-run", action="store_true",
                   help="plan only: report what would be rewritten/expired")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from tokenc.iceberg import (compact_table, expire_snapshots,
                                plan_compaction, plan_deletes, plan_files)

    owns_session = SparkSession.getActiveSession() is None
    spark = (SparkSession.builder.appName("tokenc-compact").getOrCreate())
    t0 = time.time()
    out = {"table": os.path.abspath(args.table)}
    if args.dry_run:
        plan = plan_files(args.table)
        dels = plan_deletes(args.table)
        groups, carries = plan_compaction(
            plan, dels, target_file_bytes=args.target_file_mb << 20)
        out["compact"] = {"files_before": len(plan),
                          "rewritten": sum(map(len, groups)),
                          "carried": len(carries), "outputs": len(groups),
                          "deletes_applied": len(dels)}
    else:
        _, report = compact_table(
            spark, args.table,
            target_file_bytes=args.target_file_mb << 20,
            timestamp_ms=args.timestamp_ms)
        out["compact"] = report
    if args.expire_keep_last is not None or args.expire_older_than_ms is not None:
        _, exp = expire_snapshots(
            args.table, keep_last=args.expire_keep_last or 1,
            older_than_ms=args.expire_older_than_ms, dry_run=args.dry_run)
        out["expire"] = {"expired": exp["expired"], "kept": exp["kept"],
                         "deleted_metadata": len(exp["deleted_metadata"]),
                         "deleted_data": len(exp["deleted_data"])}
    out["wall_sec"] = round(time.time() - t0, 3)
    print(json.dumps(out))
    if owns_session:  # in-process callers (tests) keep their session
        spark.stop()


if __name__ == "__main__":
    main()
