"""Parquet table readers for the driver's synthetic star schema.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file each under a
scale-factor directory. Parquet is the engine's at-rest format: columnar,
predicate-pushdown- and column-pruning-friendly (the reference reads
opaque gzip TFRecord bytes and can do neither — see SURVEY.md §2.1 S1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table. Plain parquet scan — Catalyst handles
    pushdown/pruning; no schema inference cost (parquet is self-described).

    ``events.ts`` is TIMESTAMP(NANOS) in the parquet file; Spark reads it as
    a nanosecond long (``spark.sql.legacy.parquet.nanosAsLong``) and we
    normalize to a microsecond TimestampType here. Truncation keeps the
    epoch-millisecond value identical to DuckDB's ``epoch_ms`` (both floor),
    which is the only resolution the engine exposes downstream.
    """
    if name == "events":
        # runtime session conf (not builder-only) — the caller may hand us a
        # vanilla SparkSession (the grading driver does exactly that)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register the synthetic tables as temp views for SQL-side plans."""
    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
