"""Custom stateful streaming operator — sessionization with
``applyInPandasWithState`` (the engine's user-extension surface for
stateful stream processing; SURVEY.md §2.6 lists Beam's stateful DoFn gap).

Per user, events are folded into sessions split on a 30-minute inactivity
gap. The group state carries the open session across micro-batches (batch
boundaries are NOT session boundaries); completed sessions emit as soon as
a later event closes them, and the final batch flushes the open session so
a bounded replay produces exactly the batch-SQL sessionization (the driver
oracle cross-checks this).

Scale notes: state is one small tuple per active user; the watermark-driven
timeout (GroupStateTimeout) would evict idle users in a true unbounded run
— here the bounded replay flushes instead, keeping the operator
deterministic for verification.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_MS = 30 * 60 * 1000

OUTPUT_SCHEMA = (
    "user_id long, session_start_ms long, session_end_ms long, n_events long"
)
STATE_SCHEMA = "start long, end long, n long"


def _sessionize_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        start, end, n = state.get
    else:
        start = end = None
        n = 0

    out: list[tuple[int, int, int, int]] = []
    ts_all = (
        pd.concat([pdf["ts_ms"] for pdf in pdfs]).sort_values().to_numpy()
    )
    for t in ts_all:
        t = int(t)
        if start is None:
            start, end, n = t, t, 1
        elif t - end > SESSION_GAP_MS:
            out.append((user_id, start, end, n))
            start, end, n = t, t, 1
        else:
            end, n = t, n + 1

    # bounded replay: flush the open session at the end of input so the
    # result equals batch sessionization (an unbounded run would instead
    # keep it in state and rely on the timeout to emit). This flush is only
    # correct when the replay is ONE micro-batch — _run_to_memory asserts
    # that (expect_single_batch) rather than silently splitting sessions
    # at batch boundaries.
    if start is not None:
        out.append((user_id, start, end, n))
        state.remove()
    yield pd.DataFrame(
        out, columns=["user_id", "session_start_ms", "session_end_ms", "n_events"]
    )


def streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful sessionizer over the replayed events stream and
    return the materialized sessions."""
    from pyspark.sql import functions as F

    from .windowed import _events_stream, _run_to_memory

    events = _events_stream(spark, sf_dir).select(
        "user_id", F.unix_millis("ts").alias("ts_ms")
    )
    sessions = events.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_to_memory(sessions, "append", expect_single_batch=True)
