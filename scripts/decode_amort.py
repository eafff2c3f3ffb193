#!/usr/bin/env python
"""Amortized decode scaling measurement over the DataFrame decode path.

Historical (round 1): this was the addendum evidencing decode scaling with
fixed costs amortized. Since round 2 the amortized protocol lives in
bench.py itself (TOKENC_DECODE_REPEAT over decode_invariants_files); this
script remains for ad-hoc DF-path decode measurements.
Usage: python scripts/decode_amort.py <cpus> <repeat> <enc_dir>"""
import os, sys, time, functools
sys.path.insert(0,"/root/repo")
CPUS = int(sys.argv[1]); REPEAT = int(sys.argv[2])
from pyspark.sql import SparkSession, functions as F
from tokenc.datagen import TOKENS_ARROW_SCHEMA
from tokenc.engine import decode_invariants
from tokenc.schema import specs_from_arrow_schema
spark = (SparkSession.builder.master(f"local[{CPUS}]")
     .config("spark.sql.shuffle.partitions", str(CPUS))
     .config("spark.driver.memory","16g")
     .config("spark.driver.extraJavaOptions","-XX:+UseParallelGC")
     .config("spark.sql.files.maxPartitionBytes", str(8<<20))
     .config("spark.local.dir","/dev/shm/spark_local")
     .config("spark.ui.enabled","false").appName("damort").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
specs = specs_from_arrow_schema(TOKENS_ARROW_SCHEMA)
enc = spark.read.parquet(sys.argv[3]).select(*[f"{s.name}_blob" for s in specs])
big = functools.reduce(lambda a,b: a.union(b), [enc]*REPEAT)
def run():
    inv = decode_invariants(big, specs, TOKENS_ARROW_SCHEMA)
    return (inv.groupBy("column").agg(F.sum("n_values")).collect())
ts = []
for _ in range(3):
    t0=time.time(); run(); ts.append(time.time()-t0)
print(f"cpus={CPUS} repeat={REPEAT} min={min(ts):.2f}s all={['%.1f'%x for x in ts]}")
