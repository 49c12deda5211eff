"""Streaming dead-letter quarantine — the admission-gate pattern for an
unbounded ingest: every micro-batch splits into clean rows and
rule-violating rows, with violations landed to a quarantine sink carrying
their per-row failed-rule list (functions/expectations.py row-level
rules; the batch twin is `quarantined_docs`).

Exactly-once: each micro-batch OVERWRITES its own `batch=<id>` subdir, so
a crash-replayed batch is idempotent (the foreachBatch analogue of the
upsert sink's swap discipline — here batches are disjoint row sets, so
per-batch directories suffice and no merge is needed). State is ZERO:
this is a pure map-only split, the cheapest possible streaming operator —
no watermark, no store, any slicing lands on the batch result.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.expectations import Expectation, enforce_expectations

EVENT_RULES: list[Expectation] = [
    Expectation("user_present", "user_id", "not_null"),
    Expectation(
        "known_type", "event_type", "in_set",
        values=("click", "view", "purchase", "signup"),
    ),
    Expectation("value_min", "value", "min_value", bound=0.5),
]

OUT_SCHEMA = "event_id long, n_failed int, failed_rules string"


def stream_quarantine(
    spark: SparkSession,
    sf_dir: str,
    events: DataFrame | None = None,
    rules: list[Expectation] | None = None,
) -> DataFrame:
    """Run the event stream through the row-level admission gate; return
    the full quarantine table (event_id, n_failed, failed_rules) —
    bit-identical to the batch enforcement over the same rows."""
    import shutil

    from ._replay import scratch_dir
    from .windowed import _events_stream, stream_partitions

    work = scratch_dir("quarantine_")
    qdir = os.path.join(work, "quarantined")
    ckpt = os.path.join(work, "ckpt")
    rules = EVENT_RULES if rules is None else rules

    def split(batch_df: DataFrame, batch_id: int) -> None:
        bad = enforce_expectations(batch_df, rules, ["event_id"])
        bad.write.mode("overwrite").parquet(
            os.path.join(qdir, f"batch={batch_id}")
        )

    src = events if events is not None else _events_stream(spark, sf_dir)
    try:
        with stream_partitions(spark):
            q = (
                src.writeStream.outputMode("append")
                .foreachBatch(split)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        result = (
            spark.read.schema(OUT_SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(qdir)
        )
        rows = result.collect()  # Row-based: vanilla-session safe
        return spark.createDataFrame(rows, schema=OUT_SCHEMA)
    finally:
        shutil.rmtree(work, ignore_errors=True)
