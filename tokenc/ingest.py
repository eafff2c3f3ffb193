"""Ingestion frontends: CSV / JSON / Arrow → tokens table.

The reference ships dedicated CSVWriter/JSONWriter/ArrowWriter frontends
(writer/csv.go:26-47, writer/json.go:24-46, writer/arrow.go:31-57,
marshal/json.go:18); on Spark these collapse to `spark.read.{csv,json}` +
casts — the engine consumes any DataFrame matching the tokens schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (ArrayType, IntegerType, StringType,
                               StructField, StructType)

TOKENS_SPARK_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("tokens", ArrayType(IntegerType())),
    StructField("n_tok", IntegerType()),
    StructField("source", StringType()),
])


def tokens_from_json(spark: SparkSession, path: str) -> DataFrame:
    """JSON lines {"doc_id": ..., "tokens": [...], "source": ...}."""
    df = spark.read.schema(TOKENS_SPARK_SCHEMA).json(path)
    return df.withColumn("n_tok", F.coalesce(F.col("n_tok"), F.size("tokens")))


def tokens_from_csv(spark: SparkSession, path: str, sep: str = ",",
                    token_sep: str = " ") -> DataFrame:
    """CSV with columns doc_id, tokens (token_sep-joined ints), source —
    string→typed conversion ≙ reference types.StrToParquetType
    (types/types.go:81-204), done by Spark casts."""
    raw = spark.read.option("header", "true").option("sep", sep).csv(path)
    return (raw.select(
        F.col("doc_id").cast("string"),
        F.expr(f"transform(filter(split(tokens, '{token_sep}'), x -> length(x) > 0), "
               "x -> cast(x as int))").alias("tokens"),
        F.col("source").cast("string"))
        .withColumn("n_tok", F.size("tokens").cast("int"))
        .select("doc_id", "tokens", "n_tok", "source"))
