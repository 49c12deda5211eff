"""Structured Streaming operators — the streaming extension of the engine
(SURVEY.md §2.6: the reference is batch-only; its core aggregation A1 is an
associative/commutative monoid and therefore streams cleanly).

Patterns covered:
  * tumbling event-time windows with a watermark over the events stream
  * the per-device profile aggregation running incrementally (same merge
    laws as operators/device_profile.py, maintained by the streaming
    state store)

For local verification the parquet table is replayed through readStream
with a memory sink and processAllAvailable() — one deterministic batch.
On a cluster the same code points at Kafka/object-store streams; with
watermarks bounding state, the aggregation state store holds one row per
open (window, key).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_QUERY_SEQ = 0


def _run_to_memory(stream_df: DataFrame, output_mode: str) -> DataFrame:
    """Execute a streaming frame to completion against the available input
    and return the materialized result (deterministic: single replay)."""
    global _QUERY_SEQ
    _QUERY_SEQ += 1
    name = f"stream_out_{os.getpid()}_{_QUERY_SEQ}"
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    return spark.table(name)


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    batch = load_table(spark, sf_dir, "events")  # establishes schema + ts conv
    # readStream requires a directory: stream the sf dir with a glob filter
    stream = (
        spark.readStream.schema(
            spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    _ = batch  # schema side effects only
    return stream


def stream_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event_type with a 30-minute
    watermark: count + exact-decimal value sum. Returns the final windows
    as a batch frame (window exposed as epoch-ms start for portability)."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(
                "cast(cast(floor(sum(cast(value as decimal(18,4))) * 100 + 0.5) as bigint) as double) / 100"
            ).alias("sum_value"),
        )
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.unix_millis(F.col("w.start")).alias("window_start_ms"),
        "event_type",
        "n_events",
        "sum_value",
    )


def streaming_device_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The A1 monoid streaming: per (user) device, incremental
    first/last/count maintained by the state store — the streaming shape of
    the reference's Combine.perKey(mergeDps)."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .agg(
            F.min(F.unix_millis("ts")).alias("first_at"),
            F.max(F.unix_millis("ts")).alias("last_at"),
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("event_type").alias("approx_types"),
        )
    )
    return _run_to_memory(agg, "complete")
