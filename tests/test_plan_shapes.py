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


def test_token_budget_mixture_rates_broadcast(spark):
    """The per-source rate relation is tiny and must broadcast onto the
    corpus filter — a SortMergeJoin here shuffles the whole corpus for a
    20-row dimension."""
    plan = _plan(spark, "token_budget_mixture", mode="simple")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    # the 1-row corpus-totals join is the only nested-loop product
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_revenue_sums_stay_in_codegen_hash_agg(spark):
    """The bigint-cents accumulators must use HashAggregate (codegen), not
    ObjectHashAggregate — the wide-decimal slow path this repo moved off
    in round 4."""
    for name in ("revenue_cube", "monthly_revenue_trend"):
        plan = _plan(spark, name, mode="simple")
        assert "ObjectHashAggregate" not in plan, name
        assert "HashAggregate" in plan, name


def test_zipf_and_shingle_paths_have_no_python(spark):
    """doc_quality_zipf and shingle_dup_rate are pure JVM plans — no
    Python evaluation nodes anywhere (the exploded/shingle relations are
    codegen constructions)."""
    for name in ("doc_quality_zipf", "shingle_dup_rate"):
        plan = _plan(spark, name, mode="simple")
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_audio_chunks_python_is_duration_decode_only(spark):
    """audio_chunks runs exactly one Arrow-batched Python stage (the
    duration decode); the chunk fan-out generator must be JVM-side."""
    plan = _plan(spark, "audio_chunks", mode="simple")
    assert plan.count("MapInPandas") == 1
    assert "Generate explode" in plan or "Generate" in plan


def test_parity_aggregates_do_partial_aggregation(spark):
    """Map-side partial aggregation (two HashAggregate levels around the
    exchange) must stay in place for the per-device profile aggregate —
    the difference between shuffling raw facts and shuffling partials."""
    plan = _plan(spark, "device_profile_summary", mode="simple")
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_doc_chunks_is_jvm_only_generate(spark):
    """doc_chunks is one scan + JVM sequence fan-out: no Python nodes, no
    join, no shuffle exchange anywhere (map-only at any scale)."""
    plan = _plan(spark, "doc_chunks", mode="simple")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert "Join" not in plan
    assert "Exchange hashpartitioning" not in plan
    assert "Generate" in plan


def test_semantic_dedup_broadcasts_centroids_no_cartesian(spark):
    """semantic_dedup's distance joins broadcast the (k x dims) centroid
    relation; the only pair join is cluster-keyed — no cartesian product
    may appear anywhere in the plan."""
    plan = _plan(spark, "semantic_dedup", mode="simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_temperature_mix_rates_broadcast(spark):
    """The per-source rate relation broadcasts onto the corpus filter —
    same contract as token_budget_mixture."""
    plan = _plan(spark, "temperature_mix", mode="simple")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_dedup_incoming_no_cartesian_single_python_free(spark):
    """Incoming-batch dedup: band-bucket equi-joins only — no cartesian
    product, no Python nodes anywhere."""
    plan = _plan(spark, "dedup_incoming", mode="simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_table_profile_is_single_scan_no_join(spark):
    """The profile computes every metric in one aggregation pass — any
    join or repeated scan means the implementation regressed to
    per-column passes."""
    plan = _plan(spark, "table_profile", mode="simple")
    assert "Join" not in plan
    assert plan.count("FileScan") <= 1 or plan.count("Scan parquet") <= 1


def test_oov_rate_vocab_broadcast_no_token_shuffle_join(spark):
    """The vocab membership test must be a broadcast join (k rows) — a
    SortMergeJoin here means the whole token stream shuffled on the
    token just to test membership."""
    plan = _plan(spark, "oov_rate", mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_kmv_sketch_single_window_no_join(spark):
    """KMV is distinct + one per-group window + one agg: no join should
    appear anywhere in the plan."""
    plan = _plan(spark, "kmv_user_distinct", mode="simple")
    assert "Join" not in plan


def test_quarantine_is_map_only(spark):
    """Row-level enforcement is pure column expressions over one scan:
    no exchange, no join, no aggregate."""
    plan = _plan(spark, "quarantined_docs", mode="simple")
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "Aggregate" not in plan.replace("HashAggregate", "")
    assert "HashAggregate" not in plan


def test_rolling_features_single_user_shuffle(spark):
    """All three windows share the user_id partitioning: exactly one
    Exchange in the plan."""
    plan = _plan(spark, "rolling_user_features", mode="simple")
    assert plan.count("Exchange") == 1


def test_retention_cohorts_two_exchanges(spark):
    """Window min + distinct reuse one user_id shuffle; only the tiny
    final (cohort, week) aggregation adds a second."""
    plan = _plan(spark, "retention_cohorts", mode="simple")
    assert plan.count("Exchange") <= 2


def test_brand_supplier_stats_plan_pinned(spark):
    """Q16 shape (NOT-IN null-aware anti-join + distinct-supplier count):
    the anti-join and the part-side join must both be broadcast-built —
    a SortMergeJoin or a BroadcastNestedLoopJoin here means the
    null-aware NOT IN degenerated into a shuffle or a product (the r5
    bench drift on this query was session variance; this pins the plan so
    a real regression cannot hide behind that explanation again)."""
    plan = _plan(spark, "brand_supplier_stats", mode="simple")
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan


def test_graph_reachability_frontier_broadcast(spark):
    """Every BFS expansion join must be broadcast-built (node-sized
    frontier into the cached edge relation): a SortMergeJoin here means
    the edge relation reshuffled per hop — the scale contract
    khop_reachability documents."""
    from adtech_log_data_pipeline_spark.functions._cache import release_cached

    plan = _plan(spark, "graph_reachability", mode="simple")
    release_cached()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 3  # one per hop


def test_shortest_path_levels_broadcast(spark):
    """Same contract for the weighted Bellman-Ford levels: per-hop
    expansion joins broadcast the node-sized level, edges never
    reshuffle."""
    from adtech_log_data_pipeline_spark.functions._cache import release_cached

    plan = _plan(spark, "shortest_path_parts", mode="simple")
    release_cached()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 3


def test_dsir_selection_weights_broadcast_and_takeordered(spark):
    """The vocab-weight table must broadcast onto the token stream (a
    SortMergeJoin would reshuffle the corpus for a vocab-sized side),
    and top-N must plan as TakeOrdered, never a global Sort + Limit of
    the doc relation."""
    plan = _plan(spark, "dsir_selection", mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_k_anonymity_is_pure_hash_agg_cascade(spark):
    """The census is groupBy-only: no joins, no windows over the row
    relation, no cartesian products."""
    plan = _plan(spark, "k_anonymity_audit", mode="simple")
    assert "HashAggregate" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_hybrid_rrf_is_bounded_fusion(spark):
    """RRF fuses two bounded top-k lists: TakeOrdered feeds the fusion,
    and the final rank window runs over a LocalLimit'd relation, never
    the corpus."""
    plan = _plan(spark, "hybrid_search_rrf", mode="simple")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_trimmed_stats_no_global_row_window(spark):
    """The percentile pick must use the two-phase bucket scan: every
    Window in the plan is partitioned (no 'Window [' over an empty
    partition spec on the row relation would be cheap to miss, so pin
    the coarse invariant: at most bounded windows, no global sort of
    the cents relation before aggregation)."""
    plan = _plan(spark, "trimmed_revenue_stats", mode="formatted")
    # the distinct-cents relation is windowed PARTITIONED BY bucket;
    # a partition-less window over row data would print 'Arguments: [...]'
    # with an empty partition spec AND a corpus-sized child — assert the
    # partitioned form is present
    assert "bucket" in plan
    assert "CartesianProduct" not in plan


def test_ivfpq_artifact_scans_prune_and_broadcast(spark):
    """The artifact-backed IVF-PQ plan must (a) read ONLY (vec_id, sub,
    cid) from the corpus codes parquet — column pruning through the
    PQIndex seam — (b) push the query-side vec_id bound into a parquet
    scan, and (c) never sort-merge-shuffle the corpus codes before the
    ADC partial agg (every join on that side builds from a broadcast).
    This is the shape that keeps a 1e9-vector index query sublinear."""
    p = _plan(spark, "ivfpq_topk")
    assert "struct<vec_id:bigint,sub:int,cid:bigint>" in p, p[:2000]
    assert "LessThan(vec_id," in p, p[:2000]
    assert "SortMergeJoin" not in p
    assert p.count("BroadcastExchange") >= 4


def test_stream_pq_screen_static_side_prunes(spark):
    """The streaming screen's static corpus derives from the artifact
    codes/codebook scans with pruned schemas; its batch-restated shape
    must stay join+fold only (no Python UDF beyond the coarse-assign
    pandas projection)."""
    import io
    from contextlib import redirect_stdout

    from adtech_log_data_pipeline_spark.functions.similarity import (
        build_pq_index,
        load_pq_index,
    )
    import tempfile

    from adtech_log_data_pipeline_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, SF, "embeddings")
    with tempfile.TemporaryDirectory() as d:
        build_pq_index(emb, d)
        idx = load_pq_index(spark, d)
        cw = idx.codebook.withColumn("sub", (F.col("dim") / 2).cast("int"))
        rec = idx.codes.join(cw, ["sub", "cid"])
        buf = io.StringIO()
        with redirect_stdout(buf):
            rec.explain("formatted")
        p = buf.getvalue()
        assert "struct<vec_id:bigint,sub:int,cid:bigint>" in p, p[:2000]
        assert "SortMergeJoin" not in p
