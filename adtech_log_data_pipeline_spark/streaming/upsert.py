"""foreachBatch keyed-upsert sink — the production pattern for maintaining
a queryable "latest state per key" table from a stream when the sink has
no native streaming support (JDBC, plain parquet, a REST API).

The aggregation runs in UPDATE output mode: each micro-batch emits only
the keys whose aggregate changed, carrying the full cumulative value
(engine state holds one row per key — bounded by key cardinality, not
stream length). foreachBatch then merges those changed rows into the
state table by key.

Merge strategy note: with plain parquet the merge is read-union-rewrite —
correct, but O(table) per batch. On a real deployment the same
foreachBatch body issues `MERGE INTO` against Delta/Iceberg/JDBC and the
cost drops to O(changed keys); the streaming side (update mode, changed
keys only) is already shaped for that. The rewrite here is the
lowest-common-denominator sink, not the recommended one, and the swap is
one function body.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STATE_SCHEMA = (
    "user_id long, last_ts_ms long, last_event_id long,"
    " last_event_type string, n_events long"
)


def _merge_batch(state_dir: str) -> "callable":
    """foreachBatch body: upsert the batch's changed keys into the state
    parquet. Runs on the driver once per micro-batch; all data movement is
    executor-side DataFrame work."""

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        import shutil

        spark = batch_df.sparkSession
        # Land the micro-batch to parquet and read it back: the streaming
        # plan's attributes cannot be referenced again inside the batch
        # merge plan (join + union would re-analyze them and fail with
        # "key not found: user_id#N"), and the landed relation has clean
        # batch lineage. Fully executor-side — no driver materialization.
        tmp = f"{state_dir}.batch-{batch_id}"
        nxt = f"{state_dir}.next-{batch_id}"
        old = f"{state_dir}.old-{batch_id}"
        # crash recovery for a re-run of this same batch id: if the prior
        # attempt died mid-swap, either the old state sits aside (restore
        # it) or both old and new exist (the swap completed; drop old)
        if os.path.isdir(old):
            if os.path.isdir(state_dir):
                shutil.rmtree(old, ignore_errors=True)
            else:
                os.rename(old, state_dir)
        batch_df.write.mode("overwrite").parquet(tmp)
        try:
            batch = spark.read.schema(STATE_SCHEMA).parquet(tmp)
            if os.path.isdir(state_dir):
                existing = spark.read.schema(STATE_SCHEMA).parquet(state_dir)
                # batch rows carry the new cumulative aggregates for their
                # keys: keep them, keep existing rows for untouched keys
                merged = existing.join(
                    batch.select("user_id"), "user_id", "left_anti"
                ).unionByName(batch)
            else:
                merged = batch
            # write the NEW state beside the old one, then swap — never
            # overwrite the directory the merge plan is still reading (a
            # recomputed partition after cache eviction would otherwise
            # re-scan a half-deleted input). Swap order keeps a complete
            # state directory on disk at every instant: old is renamed
            # ASIDE (recoverable), new renamed in, then old deleted — a
            # crash at any point leaves either the old or the new state
            # present, and the checkpoint re-runs the interrupted batch.
            merged.write.mode("overwrite").parquet(nxt)
            if os.path.isdir(state_dir):
                os.rename(state_dir, old)
            os.rename(nxt, state_dir)
            shutil.rmtree(old, ignore_errors=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
            shutil.rmtree(nxt, ignore_errors=True)

    return merge


def stream_upsert_latest(
    spark: SparkSession,
    sf_dir: str,
    state_dir: str | None = None,
    events: DataFrame | None = None,
) -> DataFrame:
    """Maintain (user_id, last_ts_ms, last_event_id, last_event_type,
    n_events) — the latest event and running count per user — as an
    upserted parquet state table, and return its final contents.

    The "latest" pick is the lexicographic max of (ts_ms, event_id,
    event_type): deterministic under any arrival order (event_id is the
    unique tiebreak), so a bounded replay equals the batch query the
    DuckDB oracle states."""
    import shutil

    from ._replay import scratch_dir
    from .windowed import _events_stream, stream_partitions

    own_dir = state_dir is None
    if own_dir:
        state_dir = os.path.join(scratch_dir("upsert_state_"), "state")
    agg = (
        (events if events is not None else _events_stream(spark, sf_dir))
        .select(
            "user_id",
            F.struct(
                F.unix_millis("ts").alias("ts_ms"),
                "event_id",
                "event_type",
            ).alias("ev"),
        )
        .groupBy("user_id")
        .agg(F.max("ev").alias("last"), F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("last.ts_ms").alias("last_ts_ms"),
            F.col("last.event_id").alias("last_event_id"),
            F.col("last.event_type").alias("last_event_type"),
            "n_events",
        )
    )
    ckpt = scratch_dir("upsert_ckpt_")
    try:
        with stream_partitions(spark):
            q = (
                agg.writeStream.outputMode("update")
                .foreachBatch(_merge_batch(state_dir))
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        result = spark.read.schema(STATE_SCHEMA).parquet(state_dir)
        if own_dir:
            # Row-based materialization (not toPandas): pandas turns NULL
            # long columns into float64 NaN, which the vanilla (Arrow-off)
            # session's createDataFrame verifier rejects. Rows keep None.
            rows = result.collect()
            return spark.createDataFrame(rows, schema=STATE_SCHEMA)
        return result
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        if own_dir:
            shutil.rmtree(os.path.dirname(state_dir), ignore_errors=True)
