"""Structured Streaming smoke: the parquet replay must produce exactly the
batch semantics (the driver's oracle cross-checks values; here we check
conservation + schema)."""

from pyspark.sql import functions as F

from adtech_log_data_pipeline_spark.sources.tables import load_table
from adtech_log_data_pipeline_spark.streaming import (
    stream_window_counts,
    streaming_device_activity,
)

SF = "/root/testdata/sf0.001"


def test_window_counts_emit_exactly_finalized_windows(spark):
    """Append mode: every window whose end <= watermark (max event time -
    30 min, inclusive) is emitted once; open windows are withheld."""
    out = stream_window_counts(spark, SF)
    ev = load_table(spark, SF, "events")
    wm_ms = ev.agg(F.max(F.unix_millis("ts"))).collect()[0][0] - 30 * 60 * 1000
    expected = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.unix_millis(F.col("w.end")) <= wm_ms)
    )
    assert out.count() == expected.count()
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == expected.agg(F.sum("n")).collect()[0][0]
    assert out.columns == ["window_start_ms", "event_type", "n_events", "sum_value"]


def test_streaming_device_activity_matches_batch_bounds(spark):
    out = {r["user_id"]: r for r in streaming_device_activity(spark, SF).collect()}
    batch = {
        r["user_id"]: r
        for r in load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            F.min(F.unix_millis("ts")).alias("first_at"),
            F.max(F.unix_millis("ts")).alias("last_at"),
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
        )
        .collect()
    }
    assert set(out) == set(batch)
    for uid, b in batch.items():
        s = out[uid]
        assert (s["first_at"], s["last_at"], s["n_events"], s["n_types"]) == (
            b["first_at"],
            b["last_at"],
            b["n_events"],
            b["n_types"],
        )


def test_stateful_sessionize_matches_batch(spark):
    from adtech_log_data_pipeline_spark.streaming import streaming_sessionize
    from pyspark.sql import functions as F

    out = streaming_sessionize(spark, SF)
    # sessions partition each user's events: totals must conserve
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == load_table(spark, SF, "events").count()
    rows = out.collect()
    assert all(r["session_start_ms"] <= r["session_end_ms"] for r in rows)
    # no session may contain an internal gap > 30 min: spot-check bounds
    per_user = out.groupBy("user_id").count().collect()
    assert all(r["count"] >= 1 for r in per_user)


def test_stream_dedup_equals_batch_distinct(spark):
    """Bounded replay: watermark-bounded streaming dedup == batch DISTINCT
    on the key columns."""
    from adtech_log_data_pipeline_spark.streaming import stream_dedup_keys

    out = stream_dedup_keys(spark, SF)
    ev = load_table(spark, SF, "events")
    expected = ev.select("user_id", "event_type").distinct()
    assert out.count() == expected.count()
    assert out.exceptAll(expected).count() == 0
    assert out.columns == ["user_id", "event_type"]


def test_stream_attribution_equals_batch_interval_join(spark):
    """Bounded replay: the watermarked stream-stream interval join equals
    the batch interval join."""
    from adtech_log_data_pipeline_spark.streaming import stream_click_attribution

    out = stream_click_attribution(spark, SF)
    ev = load_table(spark, SF, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    expected = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 60 MINUTES")),
    )
    assert out.count() == expected.count()
    assert out.agg(F.sum("lag_ms")).collect()[0][0] == expected.select(
        (F.unix_millis("p_ts") - F.unix_millis("c_ts")).alias("lag")
    ).agg(F.sum("lag")).collect()[0][0]


def test_merge_spend_conserves_counts_and_cents():
    """The spend interval-merge law: any fold order conserves the point
    count and the total cents, and sessions stay gap-separated."""
    from adtech_log_data_pipeline_spark.streaming.sessionize import SESSION_GAP_MS
    from adtech_log_data_pipeline_spark.streaming.spend import _merge_spend

    pts = [(0, 10), (1000, 20), (SESSION_GAP_MS + 2000, 5), (500, 7)]
    a = _merge_spend([], pts)
    # incremental fold in two chunks equals one-shot fold
    b = _merge_spend(_merge_spend([], pts[:2]), pts[2:])
    assert a == b
    assert sum(n for _, _, n, _ in a) == 4
    assert sum(c for _, _, _, c in a) == 42
    for (s1, e1, _, _), (s2, _, _, _) in zip(a, a[1:]):
        assert s2 - e1 > SESSION_GAP_MS


def test_spend_stream_routes_by_capability(spark):
    """The operator prefers transformWithStateInPandas and falls back to
    applyInPandasWithState when the TWS state protocol cannot run (no
    protobuf in this env) — both produce the gated, oracle-checked
    result."""
    from adtech_log_data_pipeline_spark.streaming.spend import tws_available

    import importlib.util

    try:
        # find_spec of a dotted name imports the parent package, which
        # itself raises when absent
        has_protobuf = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        has_protobuf = False
    assert tws_available() == has_protobuf
