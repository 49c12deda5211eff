"""Streaming KMV distinct-count sketch — foreachBatch maintenance of a
mergeable cardinality state (functions/sketch.py) over the event stream.

Why this shape: an exact streaming countDistinct needs state proportional
to the distinct count; the KMV state is k rows per group FOREVER, and its
merge is associative+commutative+idempotent (k smallest of a union), so
every micro-batch applies

    state <- kmv_keep(state UNION batch_hashes)

and any batch slicing, replay, or re-delivery yields the same state the
batch sketch computes over the full input. That idempotence is the whole
exactly-once story — no sentinel protocol, no watermark, no dedup needed
(contrast streaming/_replay.py, whose timer-driven operators DO need the
end-of-input watermark machinery).

The state merge reuses the upsert sink's land-and-swap parquet discipline
(streaming/upsert.py): the micro-batch is landed to parquet first because
streaming-plan attributes cannot be re-analyzed inside the batch merge
plan, and the new state is written BESIDE the old then renamed in.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.sketch import KMV_K, kmv_hash, kmv_keep, kmv_report

STATE_SCHEMA = "event_type string, h bigint"


def _merge_batch(state_dir: str, k: int) -> "callable":
    def merge(batch_df: DataFrame, batch_id: int) -> None:
        import shutil

        spark = batch_df.sparkSession
        tmp = f"{state_dir}.batch-{batch_id}"
        nxt = f"{state_dir}.next-{batch_id}"
        old = f"{state_dir}.old-{batch_id}"
        if os.path.isdir(old):
            # a prior attempt of this batch died mid-swap: restore or drop
            if os.path.isdir(state_dir):
                shutil.rmtree(old, ignore_errors=True)
            else:
                os.rename(old, state_dir)
        batch_df.distinct().write.mode("overwrite").parquet(tmp)
        try:
            batch = spark.read.schema(STATE_SCHEMA).parquet(tmp)
            if os.path.isdir(state_dir):
                existing = spark.read.schema(STATE_SCHEMA).parquet(state_dir)
                merged = kmv_keep(
                    existing.unionByName(batch), ["event_type"], k
                )
            else:
                merged = kmv_keep(batch, ["event_type"], k)
            merged.write.mode("overwrite").parquet(nxt)
            if os.path.isdir(state_dir):
                os.rename(state_dir, old)
            os.rename(nxt, state_dir)
            shutil.rmtree(old, ignore_errors=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
            shutil.rmtree(nxt, ignore_errors=True)

    return merge


def stream_kmv_distinct(
    spark: SparkSession,
    sf_dir: str,
    k: int = KMV_K,
    events: DataFrame | None = None,
    state_dir: str | None = None,
) -> DataFrame:
    """Maintain the per-event_type KMV distinct-user sketch as parquet
    state updated every micro-batch; return the final report
    (event_type, n_kept, kth_hash, est_distinct). Identical, bit-for-bit,
    to the batch kmv_distinct over the same rows (merge idempotence) —
    the DuckDB oracle is literally the batch query's."""
    import shutil

    from ._replay import scratch_dir
    from .windowed import _events_stream, stream_partitions

    own_dir = state_dir is None
    if own_dir:
        state_dir = os.path.join(scratch_dir("kmv_state_"), "state")
    src = events if events is not None else _events_stream(spark, sf_dir)
    hashes = src.filter(F.col("user_id").isNotNull()).select(
        "event_type", kmv_hash("user_id").alias("h")
    )
    ckpt = scratch_dir("kmv_ckpt_")
    try:
        with stream_partitions(spark):
            q = (
                hashes.writeStream.outputMode("append")
                .foreachBatch(_merge_batch(state_dir, k))
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        result = kmv_report(
            spark.read.schema(STATE_SCHEMA).parquet(state_dir),
            ["event_type"],
            k,
        )
        if own_dir:
            # Row-based materialization — vanilla-session (Arrow-off) safe
            rows = result.collect()
            return spark.createDataFrame(
                rows,
                schema=(
                    "event_type string, n_kept int, kth_hash bigint,"
                    " est_distinct double"
                ),
            )
        return result
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        if own_dir:
            shutil.rmtree(os.path.dirname(state_dir), ignore_errors=True)
