"""Streaming exact heavy hitters — foreachBatch ADDITIVE count merge with
an applied-batch-id guard, reporting the top-N hottest keys.

Contrast with the KMV sketch (streaming/sketch_stream.py): KMV's merge is
idempotent by algebra (k smallest of a set union), so batch re-delivery is
harmless. An additive count merge is NOT — replaying a committed batch
would double-count — so this state carries an `_applied` marker holding
the last merged batch_id (availableNow batch ids are monotonic) and a
re-delivered batch is skipped before any write. That guard plus the
land-and-swap parquet discipline (streaming/upsert.py) is the whole
exactly-once story for additive streaming aggregates.

State is one (key, cnt) row per distinct key — the exact-count shape; at
100 TB key cardinality you'd cap state with a space-saving sketch or fall
back to the KMV/bounded-state path, and the per-batch partial agg
(micro-batch groupBy BEFORE the merge join) keeps each merge proportional
to the batch's distinct keys, not its row count.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STATE_SCHEMA = "user_id bigint, cnt bigint"
TOPK_N = 5


def _applied_path(state_dir: str) -> str:
    return state_dir + ".applied"


def _merge_batch(state_dir: str) -> "callable":
    def merge(batch_df: DataFrame, batch_id: int) -> None:
        import shutil

        marker = _applied_path(state_dir)
        if os.path.isfile(marker):
            with open(marker) as f:
                if batch_id <= int(f.read().strip()):
                    return  # re-delivered batch: already merged, skip
        spark = batch_df.sparkSession
        tmp = f"{state_dir}.batch-{batch_id}"
        nxt = f"{state_dir}.next-{batch_id}"
        old = f"{state_dir}.old-{batch_id}"
        if os.path.isdir(old):
            # a prior attempt died mid-swap: roll back, then re-merge
            if os.path.isdir(state_dir):
                shutil.rmtree(state_dir, ignore_errors=True)
            os.rename(old, state_dir)
        # partial-agg the micro-batch first: the merge sees one row per
        # batch-distinct key, not per event
        batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("cnt")
        ).write.mode("overwrite").parquet(tmp)
        try:
            batch = spark.read.schema(STATE_SCHEMA).parquet(tmp)
            if os.path.isdir(state_dir):
                existing = spark.read.schema(STATE_SCHEMA).parquet(state_dir)
                merged = (
                    existing.unionByName(batch)
                    .groupBy("user_id")
                    .agg(F.sum("cnt").alias("cnt"))
                )
            else:
                merged = batch
            merged.write.mode("overwrite").parquet(nxt)
            if os.path.isdir(state_dir):
                os.rename(state_dir, old)
            os.rename(nxt, state_dir)
            with open(marker + ".tmp", "w") as f:
                f.write(str(batch_id))
            os.replace(marker + ".tmp", marker)
            shutil.rmtree(old, ignore_errors=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
            shutil.rmtree(nxt, ignore_errors=True)

    return merge


def stream_top_users(
    spark: SparkSession,
    sf_dir: str,
    n: int = TOPK_N,
    events: DataFrame | None = None,
    state_dir: str | None = None,
) -> DataFrame:
    """Maintain exact per-user event counts as parquet state updated every
    micro-batch; return the final top-n report
    (rank, user_id, n_events) with the deterministic (cnt desc, user_id
    asc) tiebreak. Additive merge + applied-batch-id guard make any batch
    slicing land on the batch aggregation's exact counts — the DuckDB
    oracle is literally the batch top-n query."""
    import shutil

    from pyspark.sql.window import Window

    from ._replay import scratch_dir
    from .windowed import _events_stream, stream_partitions

    own_dir = state_dir is None
    if own_dir:
        state_dir = os.path.join(scratch_dir("topk_state_"), "state")
    src = events if events is not None else _events_stream(spark, sf_dir)
    keyed = src.filter(F.col("user_id").isNotNull()).select("user_id")
    ckpt = scratch_dir("topk_ckpt_")
    try:
        with stream_partitions(spark):
            q = (
                keyed.writeStream.outputMode("append")
                .foreachBatch(_merge_batch(state_dir))
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        state = spark.read.schema(STATE_SCHEMA).parquet(state_dir)
        w = Window.orderBy(F.col("cnt").desc(), F.col("user_id").asc())
        # orderBy+limit plans as TakeOrderedAndProject (distributed
        # per-partition top-n, no global sort); the row_number window then
        # runs over n rows only
        result = (
            state.orderBy(F.col("cnt").desc(), F.col("user_id").asc())
            .limit(n)
            .withColumn("rank", F.row_number().over(w))
            .select(
                F.col("rank").cast("int").alias("rank"),
                "user_id",
                F.col("cnt").alias("n_events"),
            )
        )
        if own_dir:
            # Row-based materialization — vanilla-session (Arrow-off) safe
            rows = result.collect()
            return spark.createDataFrame(
                rows, schema="rank int, user_id bigint, n_events bigint"
            )
        return result
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        if own_dir:
            shutil.rmtree(os.path.dirname(state_dir), ignore_errors=True)
