"""Streaming incremental JOIN-VIEW maintenance (the IVM delta algebra on
a live stream).

Round 8 added batch IVM (operators/viewmaint.py): maintain V = A JOIN B
from deltas without recomputing the join. This module is its streaming
twin for the join-AGGREGATE view: per user, the number of (click,
purchase) pairs — i.e. |A_u| x |B_u| — maintained across micro-batches
with the multiplicity delta rule

    n_pairs += da * n_b_old  +  n_a_old * db  +  da * db

so the pair count is never recomputed from raw history (the state is
user-sized, the view update touches only the batch's users). This is the
classic counting-based IVM update (Gupta & Mumick 1995; DBSP's bilinear
join delta) — the exact shape a 100 TB clickstream needs, because the raw
pair relation is quadratic per user while the maintained aggregate is one
row.

Exactly-once WITHOUT idempotent merges: an additive delta applied twice
double-counts, and foreachBatch re-runs a batch id after a crash. The
state therefore lives in VERSIONED directories ``v=<batch_id>`` with an
atomic-rename commit (the snapshot/CM marker-file discipline):

* apply(batch N): if ``v=N`` exists the batch is already applied — skip
  (the crash happened after commit, before the checkpoint recorded it);
* else merge the delta into the NEWEST version < N, write to a scratch
  dir, and atomically rename to ``v=N`` (the commit point);
* crash before the rename leaves an ignorable scratch orphan; versions
  older than the previous one are vacuumed after commit.

Any crash point therefore yields either "not applied" (re-run applies
once) or "applied" (re-run skips) — the law tests drive both.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STATE_SCHEMA = (
    "user_id long, n_clicks long, n_purchases long, n_pairs long"
)

_VDIR = re.compile(r"^v=(\d+)$")


def _versions(base: str) -> list[int]:
    if not os.path.isdir(base):
        return []
    return sorted(
        int(m.group(1))
        for d in os.listdir(base)
        if (m := _VDIR.match(d)) and os.path.isdir(os.path.join(base, d))
    )


def _apply_delta(base: str) -> "callable":
    """foreachBatch body: versioned exactly-once IVM application."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        os.makedirs(base, exist_ok=True)
        final = os.path.join(base, f"v={batch_id}")
        if os.path.isdir(final):
            return  # already committed by a prior attempt of this batch
        # sweep scratch orphans from crashed attempts (any batch id)
        for d in os.listdir(base):
            if d.endswith(".tmp"):
                shutil.rmtree(os.path.join(base, d), ignore_errors=True)
        # land the micro-batch rows: streaming attributes cannot be
        # referenced inside the merge plan (the upsert-sink lineage rule)
        land = os.path.join(base, f"batch-{batch_id}.tmp")
        batch_df.select("user_id", "event_type").write.mode(
            "overwrite"
        ).parquet(land)
        try:
            raw = spark.read.schema("user_id long, event_type string")\
                .parquet(land)
            delta = (
                raw.filter(F.col("user_id").isNotNull())
                .groupBy("user_id")
                .agg(
                    F.sum(
                        F.when(F.col("event_type") == "click", 1)
                        .otherwise(0)
                    ).cast("bigint").alias("da"),
                    F.sum(
                        F.when(F.col("event_type") == "purchase", 1)
                        .otherwise(0)
                    ).cast("bigint").alias("db"),
                )
                .filter((F.col("da") > 0) | (F.col("db") > 0))
            )
            prior = [v for v in _versions(base) if v < batch_id]
            if prior:
                old = spark.read.schema(STATE_SCHEMA).parquet(
                    os.path.join(base, f"v={prior[-1]}")
                )
            else:
                old = spark.createDataFrame([], STATE_SCHEMA)
            d = delta.select(
                F.col("user_id").alias("d_user"), "da", "db"
            )
            merged = (
                old.join(d, old["user_id"] == d["d_user"], "full")
                .select(
                    F.coalesce(F.col("user_id"), F.col("d_user")).alias(
                        "user_id"
                    ),
                    F.coalesce(F.col("n_clicks"), F.lit(0)).alias("a0"),
                    F.coalesce(F.col("n_purchases"), F.lit(0)).alias("b0"),
                    F.coalesce(F.col("n_pairs"), F.lit(0)).alias("p0"),
                    F.coalesce(F.col("da"), F.lit(0)).alias("da"),
                    F.coalesce(F.col("db"), F.lit(0)).alias("db"),
                )
                .select(
                    "user_id",
                    (F.col("a0") + F.col("da")).cast("bigint").alias(
                        "n_clicks"
                    ),
                    (F.col("b0") + F.col("db")).cast("bigint").alias(
                        "n_purchases"
                    ),
                    # the bilinear IVM delta — never |A| x |B| recompute
                    (
                        F.col("p0")
                        + F.col("da") * F.col("b0")
                        + F.col("a0") * F.col("db")
                        + F.col("da") * F.col("db")
                    ).cast("bigint").alias("n_pairs"),
                )
            )
            scratch = final + ".tmp"
            merged.write.mode("overwrite").parquet(scratch)
            os.rename(scratch, final)  # the commit point
            # vacuum: keep this version and its predecessor only
            for v in _versions(base)[:-2]:
                shutil.rmtree(
                    os.path.join(base, f"v={v}"), ignore_errors=True
                )
        finally:
            shutil.rmtree(land, ignore_errors=True)

    return apply


def stream_join_view(
    spark: SparkSession,
    sf_dir: str,
    state_base: str | None = None,
    events: DataFrame | None = None,
) -> DataFrame:
    """Maintain the per-user click x purchase join-aggregate view over the
    event stream via the bilinear IVM delta, exactly-once through the
    versioned-commit protocol; return the final view (user_id, n_clicks,
    n_purchases, n_pairs) for users with at least one click or purchase.

    The DuckDB oracle states the CLOSED FORM (count(click) x
    count(purchase) per user) — equality proves the incremental algebra
    converged to the direct join-aggregate under the replay's slicing."""
    from ._replay import scratch_dir
    from .windowed import _events_stream, stream_partitions

    own = state_base is None
    if own:
        state_base = os.path.join(scratch_dir("joinview_"), "state")
    src = (
        events if events is not None else _events_stream(spark, sf_dir)
    ).filter(F.col("event_type").isin("click", "purchase"))
    ckpt = scratch_dir("joinview_ckpt_")
    try:
        with stream_partitions(spark):
            q = (
                src.writeStream.outputMode("append")
                .foreachBatch(_apply_delta(state_base))
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        vs = _versions(state_base)
        if not vs:
            return spark.createDataFrame([], STATE_SCHEMA)
        result = spark.read.schema(STATE_SCHEMA).parquet(
            os.path.join(state_base, f"v={vs[-1]}")
        )
        # Row-based materialization: frees the scratch dir for cleanup
        # and keeps NULL longs as None on the vanilla session
        rows = result.collect()
        return spark.createDataFrame(rows, schema=STATE_SCHEMA)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        if own:
            shutil.rmtree(os.path.dirname(state_base), ignore_errors=True)
