"""Plan-shape regression tests: the physical plans the engine relies on at
scale must not silently regress — small dimensions stay broadcast (no
sort-merge shuffle of the fact), filters reach the parquet scans, and the
only nested-loop product allowed is the documented 1-row scalar broadcast.

These read .explain() output, which is stable enough for coarse assertions
(operator names), not exact plan text.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from adtech_log_data_pipeline_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str, mode: str = "formatted") -> str:
    df = QUERIES[name](spark, SF)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_feature_inputs_joins_stay_broadcast(spark):
    """The suspicious anti-join, IAPP inner join, and per-device left join
    must all be broadcast-built; a SortMergeJoin here means the fact table
    shuffled for a dimension-sized side."""
    plan = _plan(spark, "feature_inputs", mode="simple")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    # the ONLY nested-loop product is the 1-row global-totals cross join
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_suspicious_ids_no_sort_merge_join(spark):
    plan = _plan(spark, "suspicious_ids")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pricing_summary_filter_pushed_to_scan(spark):
    """The shipdate predicate must reach the lineitem parquet scan as a
    pushed filter, not run post-scan only."""
    plan = _plan(spark, "pricing_summary")
    assert "PushedFilters: [" in plan
    pushed = [
        line
        for line in plan.splitlines()
        if "PushedFilters" in line and "l_shipdate" in line
    ]
    assert pushed, "l_shipdate filter did not reach the parquet scan"


def test_top_revenue_orders_small_dims_broadcast(spark):
    """customer joined to orders/lineitem: the small side must broadcast
    at this scale (AQE or static); no cartesian products anywhere."""
    plan = _plan(spark, "top_revenue_orders")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_similarity_topk_scan_prunes_columns(spark):
    """The brute-force ranker reads (vec_id, embedding) only — label must
    be pruned from the corpus-side scan ReadSchema."""
    plan = _plan(spark, "similarity_topk")
    scan_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_lines
    assert all("label" not in l for l in scan_lines)


def test_dedup_exact_is_single_agg_no_join(spark):
    """Exact dedup is groupBy(hash) — any join in this plan means the
    implementation regressed to a self-join formulation."""
    plan = _plan(spark, "dedup_exact")
    assert "Join" not in plan


def test_parity_aggregates_do_partial_aggregation(spark):
    """Map-side partial aggregation (two HashAggregate levels around the
    exchange) must stay in place for the per-device profile aggregate —
    the difference between shuffling raw facts and shuffling partials."""
    plan = _plan(spark, "device_profile_summary", mode="simple")
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan
