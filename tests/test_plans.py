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
    ],
)
def test_no_row_python_in_declared_queries(spark, name):
    """Python appears only via Arrow (mapInPandas in predictions /
    multimodal); row-at-a-time BatchEvalPython must never appear."""
    assert "BatchEvalPython" not in plan_of(spark, name)


def test_whole_stage_codegen_covers_core_agg(spark):
    # codegen spans only materialize in the FINAL adaptive plan — execute first
    df = QUERIES["bidlog_validation"](spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # codegen spans render as "*(n) HashAggregate..." in the final plan
    assert "*(" in plan and "isFinalPlan=true" in plan
