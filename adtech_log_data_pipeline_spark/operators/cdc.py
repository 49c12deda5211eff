"""Batch CDC changelog application — the MERGE INTO / Delta-style
upsert-and-delete operator a warehouse uses to roll a snapshot forward
from a change stream (the batch twin of streaming/upsert.py's
foreachBatch keyed upsert; reference scope extension per SURVEY §2.6 —
the reference overwrites whole outputs, D/jobs2/PredictionJob.java:128-137,
so incremental maintenance is engine-added capability).

Semantics (latest-wins):
  * per key, only the change with the highest (seq_cols...) ordering
    applies — earlier changes are superseded, never replayed;
  * op 'D' removes the key from the snapshot;
  * any other op replaces the base row if the key exists, inserts it
    otherwise (upsert — MERGE's WHEN MATCHED UPDATE / NOT MATCHED INSERT);
  * keys never mentioned in the changelog keep their base row unchanged.

Laws (tests/test_cdc.py): empty changelog => base; applying the same
changelog twice == once (idempotent under latest-wins); applying
changelog A then B == applying A union B when B's seqs all follow A's
(the monoid composition a CDC consumer relies on for catch-up batches).

Scale shape: ONE key shuffle for the latest-wins window over the
changelog (changes are typically << snapshot), then an anti join of the
snapshot against the touched-key set — broadcastable whenever one batch
of changes fits an executor, a plain shuffled anti join otherwise; the
snapshot itself is never windowed or re-sorted. No driver collects, no
row-Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_changes(
    changes: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
) -> DataFrame:
    """Collapse a changelog to one winning row per key: the row with the
    greatest (seq_cols...) tuple. seq_cols must be a deterministic total
    order within each key (callers append a unique id as the final
    tiebreak) — the window then has exactly one rank-1 row per key under
    any partitioning."""
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in seq_cols]
    )
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_changelog(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    broadcast_keys: bool = True,
) -> DataFrame:
    """Roll `base` forward by `changes` under latest-wins MERGE semantics.

    `changes` must carry key_cols, seq_cols, op_col ('D' = delete, any
    other value INCLUDING NULL = upsert — a NULL op must not silently
    erase its key) plus exactly the base's payload columns; the result
    has the base schema. `broadcast_keys` broadcasts the touched key set
    into the anti join (the common small-batch case); pass False to let
    the planner shuffle when a batch is snapshot-sized."""
    latest = latest_changes(changes, key_cols, seq_cols)
    touched = latest.select(*key_cols)
    if broadcast_keys:
        touched = F.broadcast(touched)
    kept = base.join(touched, key_cols, "left_anti")
    applied = latest.filter(
        F.coalesce(F.col(op_col), F.lit("U")) != "D"
    ).select(*base.columns)
    return kept.unionByName(applied)
