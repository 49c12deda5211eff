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

    ``events.ts`` is TIMESTAMP(NANOS) in the parquet file. How Spark
    surfaces that varies by version: <= 4.0 needs
    ``spark.sql.legacy.parquet.nanosAsLong`` and yields a nanosecond
    bigint; 4.1+ ignores that conf and yields ``timestamp_ntz`` (nanos
    truncated to micros). Normalize both to session-TZ TimestampType
    (``timestamp_ltz``) at this one chokepoint — the session TZ is pinned
    UTC (session.py), so the NTZ->LTZ cast preserves the epoch value and
    ``unix_millis(ts)`` matches DuckDB's ``epoch_ms`` downstream.
    """
    if name == "events":
        try:
            # no-op on Spark 4.1+, needed on older versions for the bigint
            # path; runtime conf (not builder-only) because the caller may
            # hand us a vanilla SparkSession (the grading driver does)
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _normalize_event_ts(df)
    return df


def _normalize_event_ts(df: DataFrame) -> DataFrame:
    """Coerce the ``ts`` column to TimestampType (LTZ) whatever the reader
    produced: nanosecond bigint (old Spark + nanosAsLong), timestamp_ntz
    (Spark 4.1+), or already-LTZ timestamp (future-proof no-op)."""
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dtype is not None and dtype != "timestamp":
        return df.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    return df


def register_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register the synthetic tables as temp views for SQL-side plans."""
    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
