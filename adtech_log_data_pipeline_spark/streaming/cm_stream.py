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


_COMMIT_MARKER = "_COMPACT_COMMIT"


def _live_partial_dirs(state_dir: str) -> list[str]:
    """The partial dirs the reader may see: batch=* EXCLUDING *.next
    (in-flight compaction output is invisible until committed)."""
    import glob

    return sorted(
        p
        for p in glob.glob(os.path.join(state_dir, "batch=*"))
        if not p.endswith(".next")
    )


def _finish_compaction(state_dir: str, marker: dict) -> None:
    """Complete a COMMITTED compaction swap (idempotent, resumable from
    any crash point after the marker was published): publish the .next
    dir under its final name if that rename hasn't happened yet, then
    delete the subsumed partials and finally the marker."""
    import shutil

    final = os.path.join(state_dir, marker["publish"])
    nxt = final + ".next"
    if os.path.isdir(nxt) and not os.path.isdir(final):
        os.rename(nxt, final)
    for name in marker["delete"]:
        shutil.rmtree(os.path.join(state_dir, name), ignore_errors=True)
    os.remove(os.path.join(state_dir, _COMMIT_MARKER))


def _recover(state_dir: str) -> None:
    """Make the state dir consistent after a compaction crash at ANY
    point. Before the commit marker exists nothing was published, so
    stale scratch (sibling *.compact-*.tmp dirs, in-tree *.next dirs)
    is deleted and the original partials stand; after the marker exists
    the compaction is committed, so it is rolled FORWARD via
    _finish_compaction. Called by every reader and at the start of
    every compaction — no entry point ever double-counts."""
    import glob
    import json
    import shutil

    if not os.path.isdir(state_dir):
        return
    mpath = os.path.join(state_dir, _COMMIT_MARKER)
    if os.path.exists(mpath):
        with open(mpath, encoding="utf-8") as fh:
            _finish_compaction(state_dir, json.load(fh))
    for stale in glob.glob(state_dir.rstrip(os.sep) + ".compact-*.tmp"):
        shutil.rmtree(stale, ignore_errors=True)
    for stale in glob.glob(os.path.join(state_dir, "batch=*.next")):
        shutil.rmtree(stale, ignore_errors=True)


def merged_cm_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Sum the per-batch partials into the final sketch state. Reads an
    EXPLICIT list of live batch=* dirs (never *.next, never scratch), so
    an in-flight or crashed compaction can neither double-count nor
    hide counters; any interrupted compaction is first rolled forward or
    rolled back by _recover."""
    _recover(state_dir)
    parts = _live_partial_dirs(state_dir)
    if not parts:
        return spark.createDataFrame([], STATE_SCHEMA)
    return (
        spark.read.schema(STATE_SCHEMA)
        .parquet(*parts)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def compact_cm_state(spark: SparkSession, state_dir: str) -> int:
    """Collapse all live batch=<id> partials into ONE compacted partial —
    the maintenance step that bounds a long-running stream's directory
    count (partials grow one per micro-batch; state VALUES stay bounded
    at depth*width regardless). By the additive-merge law the compacted
    state merges with future partials exactly as the originals would.

    Crash-safe write-ahead-commit protocol (each step leaves a state
    _recover makes consistent, so a crash at any point neither loses
    nor double-counts a counter):

    1. _recover: finish/clean any prior interrupted compaction.
    2. Sum the live partials into a SIBLING scratch dir OUTSIDE
       state_dir (readers list state_dir, so scratch is unreachable).
    3. Rename scratch to batch=compacted-<k>.next inside state_dir —
       still invisible (readers exclude *.next). Crash ≤ here: originals
       intact, scratch/.next deleted on next _recover (rollback).
    4. COMMIT: atomically publish a marker file naming the .next dir to
       publish and the exact partials it subsumes. Crash ≥ here:
       _recover rolls the swap forward from the marker.
    5. Rename .next to batch=compacted-<k>, delete the subsumed
       partials, remove the marker.

    Returns the number of partial dirs compacted away."""
    import json

    _recover(state_dir)
    parts = _live_partial_dirs(state_dir)
    if len(parts) <= 1:
        return 0
    gen = 1 + max(
        (
            int(os.path.basename(p).rsplit("-", 1)[1])
            for p in parts
            if os.path.basename(p).startswith("batch=compacted-")
        ),
        default=0,
    )
    scratch = state_dir.rstrip(os.sep) + f".compact-{gen}.tmp"
    (
        spark.read.schema(STATE_SCHEMA)
        .parquet(*parts)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .write.mode("overwrite")
        .parquet(scratch)
    )
    publish = f"batch=compacted-{gen}"
    nxt = os.path.join(state_dir, publish + ".next")
    os.rename(scratch, nxt)
    marker = {"publish": publish, "delete": [os.path.basename(p) for p in parts]}
    mtmp = os.path.join(state_dir, _COMMIT_MARKER + ".tmp")
    with open(mtmp, "w", encoding="utf-8") as fh:
        json.dump(marker, fh)
    os.rename(mtmp, os.path.join(state_dir, _COMMIT_MARKER))
    _finish_compaction(state_dir, marker)
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
