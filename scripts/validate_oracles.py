#!/usr/bin/env python
"""Local mirror of the driver's correctness gate: run each __spark_entry__
query on Spark AND its DuckDB oracle at sf0.01; compare row count, schema
(column names), and an order-insensitive value hash per column."""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_val(v):
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def col_hash(values) -> str:
    h = hashlib.sha1()
    for v in sorted(norm_val(x) for x in values):
        h.update(v.encode())
        h.update(b"\x00")
    return h.hexdigest()[:16]


def main():
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (SparkSession.builder.master(f"local[{os.environ.get('CPUS', '8')}]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false")
             .appName("validate").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    only = sys.argv[1:] or list(qs)
    failures = 0
    for name in only:
        fn = qs[name]
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"OK?  {name}: rows-only ({len(sdf)} rows, {t_spark:.1f}s) cols={list(sdf.columns)}")
            continue
        odf = con.execute(oracles[name]).df()
        ok = True
        msgs = []
        if len(sdf) != len(odf):
            ok = False
            msgs.append(f"rowcount {len(sdf)} vs {len(odf)}")
        s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
        if s_cols != o_cols:
            ok = False
            msgs.append(f"schema {s_cols} vs {o_cols}")
        else:
            for c in s_cols:
                hs, ho = col_hash(sdf[c].tolist()), col_hash(odf[c].tolist())
                if hs != ho:
                    ok = False
                    sv = sorted(norm_val(x) for x in sdf[c].tolist())[:3]
                    ov = sorted(norm_val(x) for x in odf[c].tolist())[:3]
                    msgs.append(f"hash({c}) {hs} vs {ho}; spark {sv} oracle {ov}")
        status = "PASS" if ok else "FAIL"
        if not ok:
            failures += 1
        print(f"{status} {name}: {len(sdf)} rows {t_spark:.1f}s {'; '.join(msgs)}")
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
