"""Streaming Count-Min sketch — foreachBatch maintenance of the bounded
frequency state (functions/sketch.py::cm_sketch_state) over the event
stream, the frequency twin of streaming/sketch_stream.py's KMV.

Exactly-once shape: CM counters merge ADDITIVELY (not idempotently —
contrast KMV's min-union), so a naively re-applied micro-batch would
double-count. Instead each batch writes its own partial sketch to
``state_dir/batch=<id>/`` with overwrite — a retried batch overwrites
its own partial, making the sink idempotent per batch id — and the
final state is the (row, bucket) sum across partials, which by the
additive-merge law (test-pinned in tests/test_sketch_expectations.py)
equals the batch sketch over the concatenated input under ANY slicing.

State is bounded twice over: each partial is at most depth*width rows,
and availableNow replays produce finitely many batch dirs that a real
deployment compacts by summing into a single partial (same law).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.sketch import CM_DEPTH, CM_WIDTH, cm_sketch_state

STATE_SCHEMA = "row int, bucket int, cnt bigint"


def cm_partial_writer(state_dir: str, depth: int, width: int):
    """The foreachBatch sink: write THIS batch's partial sketch to
    batch=<id>/ with overwrite. Module-level so tests can drive the
    exactly-once mechanism directly: a Spark RETRY of batch N re-invokes
    this with the same batch_id and overwrites N's own partial — the
    merged state is unchanged (idempotent per batch id), which is the
    whole exactly-once story for an additive (non-idempotent-merge)
    sketch."""

    def write_partial(batch_df: DataFrame, batch_id: int) -> None:
        cm_sketch_state(batch_df, "user_id", depth, width).write.mode(
            "overwrite"
        ).parquet(os.path.join(state_dir, f"batch={batch_id}"))

    return write_partial


def merged_cm_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Sum the per-batch partials into the final sketch state."""
    return (
        spark.read.schema(STATE_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(state_dir)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def compact_cm_state(spark: SparkSession, state_dir: str) -> int:
    """Collapse all batch=<id> partials into ONE compacted partial —
    the maintenance step that bounds a long-running stream's directory
    count (partials grow one per micro-batch; state VALUES stay bounded
    at depth*width regardless). By the additive-merge law the compacted
    state merges with future partials exactly as the originals would.

    The swap is crash-safe the land-and-rename way: the summed state
    lands beside the live dirs as batch=compacted-<n>.next, old partial
    dirs are removed, then the rename publishes it — a crash before the
    rename leaves the original partials intact (the .next dir is not
    matched by the reader until renamed... it IS under state_dir, so the
    reader must not run mid-compaction; compaction is an offline step,
    same as parquet compaction jobs). Returns the number of partial dirs
    compacted away."""
    import glob
    import shutil

    parts = sorted(glob.glob(os.path.join(state_dir, "batch=*")))
    parts = [p for p in parts if not p.endswith(".next")]
    if len(parts) <= 1:
        return 0
    nxt = os.path.join(state_dir, "batch=compacted.next")
    merged_cm_state(spark, state_dir).write.mode("overwrite").parquet(nxt)
    for p in parts:
        shutil.rmtree(p, ignore_errors=True)
    os.rename(nxt, os.path.join(state_dir, "batch=compacted"))
    return len(parts)


def stream_cm_sketch(
    spark: SparkSession,
    sf_dir: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
    events: DataFrame | None = None,
) -> DataFrame:
    """Maintain the user_id Count-Min sketch across micro-batches; return
    the merged final state (row, bucket, cnt), bit-identical to the batch
    cm_sketch_state over the same rows — the DuckDB oracle states the
    batch construction directly."""
    import shutil

    from ._replay import scratch_dir
    from .windowed import _events_stream, stream_partitions

    work = scratch_dir("cm_state_")
    state_dir = os.path.join(work, "state")
    ckpt = scratch_dir("cm_ckpt_")

    src = events if events is not None else _events_stream(spark, sf_dir)
    try:
        with stream_partitions(spark):
            q = (
                src.select("user_id")
                .writeStream.outputMode("append")
                .foreachBatch(cm_partial_writer(state_dir, depth, width))
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        # Row-based materialization — vanilla-session (Arrow-off) safe
        rows = merged_cm_state(spark, state_dir).collect()
        return spark.createDataFrame(rows, schema=STATE_SCHEMA)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(work, ignore_errors=True)
