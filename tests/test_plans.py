"""Physical-plan assertions — lock in the scale properties the engine is
designed around: broadcast joins for dimension/side-input patterns, filter
pushdown into parquet scans, and no row-at-a-time Python in any hot path."""

import pytest

from adtech_log_data_pipeline_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def plan_of(spark, name):
    return QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", ["suspicious_ids", "feature_inputs"])
def test_side_input_joins_are_broadcast(spark, name):
    plan = plan_of(spark, name)
    assert "BroadcastHashJoin" in plan
    # the per-device side must never shuffle-join against the small dims
    assert "SortMergeJoin" not in plan


def test_pricing_summary_pushes_filter_to_scan(spark):
    plan = plan_of(spark, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_scan_prunes_columns(spark):
    plan = plan_of(spark, "top_orders_per_customer")
    # only the 3 needed columns of orders may be read
    assert "ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint,o_totalprice:double>" in plan


@pytest.mark.parametrize(
    "name",
    [
        "bidlog_validation",
        "device_profiles_flat",
        "app_profiles_flat",
        "suspicious_ids",
        "feature_inputs",
        "dedup_minhash",
        "dedup_simhash",
        "similarity_topk",
        "text_stats",
        # round-6 pure-JVM additions
        "dedup_cap_audit",
        "script_mix",
        "props_json_stats",
        "salted_hot_join",
        "dup_span_stats",
        "dup_span_clean",
        "bloom_prune_join",
        "fk_integrity_audit",
        "bigram_lm_score",
        "similar_parts",
        "weighted_sample",
        "copurchase_pagerank",
        "kmv_overlap",
        "value_deciles",
        "type_transitions",
        "cohort_ltv",
        "segment_trend",
        "incremental_rollup",
        "wide_order_facts",
        "customer_spend_rank",
        "frequent_part_pairs",
        "hourly_gapfill",
        "user_value_outliers",
    ],
)
def test_no_row_python_in_declared_queries(spark, name):
    """Python appears only via Arrow (mapInPandas in predictions /
    multimodal); row-at-a-time BatchEvalPython must never appear."""
    assert "BatchEvalPython" not in plan_of(spark, name)


@pytest.mark.parametrize(
    "name",
    [
        "dedup_cap_audit",
        "embedding_bucket_audit",
        "salted_hot_join",
        "script_mix",
        "props_json_stats",
        "ann_recall_audit",
        "dup_span_stats",
        "dup_span_clean",
        "bloom_prune_join",
        "fk_integrity_audit",
        "bigram_lm_score",
        "similar_parts",
        "weighted_sample",
        "copurchase_pagerank",
        "kmv_overlap",
        "value_deciles",
        "type_transitions",
        "cohort_ltv",
        "segment_trend",
        "incremental_rollup",
        "wide_order_facts",
        "customer_spend_rank",
        "frequent_part_pairs",
        "hourly_gapfill",
        "user_value_outliers",
    ],
)
def test_new_audit_queries_no_cartesian_product(spark, name):
    """The round-6 audit/format queries must never plan a true cartesian
    product (the only allowed nested-loop is a broadcast replication /
    1-row totals join, which plans as BroadcastNestedLoopJoin)."""
    assert "CartesianProduct" not in plan_of(spark, name)


def test_whole_stage_codegen_covers_core_agg(spark):
    # codegen spans only materialize in the FINAL adaptive plan — execute first
    df = QUERIES["bidlog_validation"](spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # codegen spans render as "*(n) HashAggregate..." in the final plan
    assert "*(" in plan and "isFinalPlan=true" in plan


def test_sliding_window_counts_matches_native_window(spark):
    """The explicit floor-arithmetic window generation (dialect-shared
    with the oracle) must equal Spark's own sliding window() semantics."""
    from pyspark.sql import functions as F

    from adtech_log_data_pipeline_spark.plans.queries import QUERIES
    from adtech_log_data_pipeline_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    ours = {
        (r["window_start_ms"], r["event_type"]): r["n_events"]
        for r in QUERIES["sliding_window_counts"](spark, sf).collect()
    }
    native = {
        (r["ws"], r["event_type"]): r["n"]
        for r in load_table(spark, sf, "events")
        .groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_millis(F.col("w.start")).alias("ws"), "event_type", "n")
        .collect()
    }
    assert ours == native


def test_conversion_funnel_is_monotone(spark):
    from adtech_log_data_pipeline_spark.plans.queries import QUERIES

    row = QUERIES["conversion_funnel"](spark, "/root/testdata/sf0.001").collect()[0]
    assert row["n_signup"] >= row["n_click_after_signup"] >= row["n_purchase_after_click"]
    assert row["n_signup"] > 0


def test_bench_and_gate_cover_every_declared_query():
    """bench.py and the oracle dict must stay in lockstep with the query
    registry — a query added without a bench entry silently vanishes from
    BENCH_r{N}.json, and one without an oracle drops to a rows-only gate."""
    import bench
    import __spark_entry__ as entry_mod
    from adtech_log_data_pipeline_spark.plans.queries import QUERIES

    assert sorted(bench.BENCH_QUERIES) == sorted(QUERIES)
    assert sorted(entry_mod.oracle_sql()) == sorted(QUERIES)


def test_gate_window_holds_least_proven_queries():
    """The external driver gates the FIRST 50 queries() entries: every
    parity query and every _GATE_FIRST entry (the never-yet-gated or
    once-red queries) must sit inside that window."""
    from adtech_log_data_pipeline_spark.plans.queries import (
        QUERIES,
        _GATE_FIRST,
        _PARITY,
    )

    window = set(list(QUERIES)[:50])
    assert set(_PARITY) <= window
    missing = set(_GATE_FIRST) - window
    assert not missing, f"queries pushed out of the driver gate window: {missing}"


def test_rolling_features_frame_semantics(spark):
    """Hand-computed RANGE-frame law: the 1h window covers strictly
    earlier events only ([t-3600000, t-1]); same-timestamp peers are
    excluded; cents accumulate exactly."""
    import datetime as dt

    from adtech_log_data_pipeline_spark.plans.relational import (
        rolling_user_features_sql,
    )

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        (1, 7, base, 1.50, "click"),                              # t=0
        (2, 7, base + dt.timedelta(minutes=10), 2.25, "view"),    # t=10m
        (3, 7, base + dt.timedelta(minutes=10), 4.00, "view"),    # same ts
        (4, 7, base + dt.timedelta(minutes=65), 8.00, "buy"),     # t=65m
        (5, 9, base + dt.timedelta(minutes=5), 1.00, "click"),    # other user
    ]
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double, event_type string"
    ).createOrReplaceTempView("events")
    try:
        out = {
            r["event_id"]: r
            for r in spark.sql(rolling_user_features_sql("spark")).collect()
        }
        assert out[1]["n_prev_1h"] == 0 and out[1]["cents_prev_1h"] == 0
        assert out[1]["ms_since_prev"] is None
        # events 2 and 3 share a timestamp: each sees only event 1
        for eid in (2, 3):
            assert out[eid]["n_prev_1h"] == 1
            assert out[eid]["cents_prev_1h"] == 150
        # event 4 at 65m: events 2,3 (10m) are inside [5m, 65m); 1 is not
        assert out[4]["n_prev_1h"] == 2
        assert out[4]["cents_prev_1h"] == 225 + 400
        assert out[4]["ms_since_prev"] == 55 * 60 * 1000
        assert out[5]["n_prev_1h"] == 0  # user isolation
    finally:
        spark.catalog.dropTempView("events")


def test_pit_join_resolves_every_purchase_exactly_once(spark):
    """Temporal-join totality law: every purchase event matches EXACTLY
    one SCD2 interval of its user (intervals tile each user's timeline:
    half-open, adjacent, the last one open-ended), and the resolved
    interval really contains the event's timestamp."""
    out = QUERIES["pit_purchase_state"](spark, SF)
    rows = out.collect()
    n_purchases = (
        QUERIES["scd2_intervals"](spark, SF).sparkSession.read.parquet(
            f"{SF}/events.parquet"
        )
        .filter("event_type = 'purchase'")
        .count()
    )
    assert len(rows) == n_purchases
    assert len({r["event_id"] for r in rows}) == n_purchases  # exactly once
    assert all(r["ts_ms"] >= r["valid_from_ms"] for r in rows)
    # a purchase's current state at its own timestamp is 'purchase'
    assert all(r["state_type"] == "purchase" for r in rows)
