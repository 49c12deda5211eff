"""Declared queries — the driver contract (`__spark_entry__.queries`).

Each entry is (spark, sf_dir) -> DataFrame, one per implemented operator
from SURVEY.md §2 plus general analytics coverage. Outputs are flat
primitive columns (nested maps/arrays are exploded) so the DuckDB oracle
hash-compare is portable; every computed column is aliased identically in
plans/oracles.py.

Float determinism convention: double SUM/AVG aggregates accumulate in
exact decimal and are quantized portably (see plans/relational.py::_dsum)
so partial-aggregation order can never flip a bit vs the oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.bidlogs import load_bid_logs, load_iapp
from ..sources.tables import register_tables
from ..operators.validate import valid_bid_logs
from ..operators.device_profile import device_profiles, flatten_device_profiles
from ..operators.app_profile import (
    app_profile_slots_from_valid,
    app_profiles,
    flatten_app_profiles,
)
from ..operators.suspicious import (
    SuspiciousThresholds,
    suspicious_ids,
    suspicious_ids_from_valid,
)
from ..operators.features import feature_pipeline_from_valid
from ..operators.inference import predict
from .relational import RELATIONAL_SQL
from .northstar import NORTHSTAR_QUERIES
from .audits import MAINTENANCE_QUERIES


# Threshold set for the DECLARED queries, tuned to the synthetic data's
# per-device activity (~47 valid bids, ~28 geos, ~27 apps per device) so all
# three suspicious rules fire and a meaningful device subset survives to the
# feature stage. The reference's own defaults (4/3/8/10, MyOptions.java:28-54)
# remain the SuspiciousThresholds dataclass defaults and are exercised in
# tests/test_suspicious.py.
QUERY_THRESHOLDS = SuspiciousThresholds(
    user_count=40, app_count=3, geo_count=30, bid_log_count=47
)


def _valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return valid_bid_logs(load_bid_logs(spark, sf_dir))


def _profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return device_profiles(_valid(spark, sf_dir))


# --- reference-parity queries (SURVEY.md §2) -------------------------------


def q_bidlog_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2: the 11-clause validity filter, summarized per exchange."""
    return (
        _valid(spark, sf_dir)
        .groupBy("exchange")
        .agg(
            F.count(F.lit(1)).alias("n_logs"),
            F.sum(F.when(F.col("bid_result") == 1, 1).otherwise(0)).alias("n_bids"),
            F.sum(F.col("bid_price").cast("long")).alias("sum_price"),
            F.min("received_at").alias("min_received"),
            F.max("received_at").alias("max_received"),
        )
    )


def q_device_profiles_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1/A1: the nested per-device profile aggregation, re-flattened to
    app-exchange granularity for hash comparison."""
    return flatten_device_profiles(_profiles(spark, sf_dir))


def q_device_profile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 rollup: per-device bounds + app/geo/bid cardinalities."""
    p = _profiles(spark, sf_dir)
    return p.select(
        "os",
        "uuid",
        "first_at",
        "last_at",
        F.size("apps").alias("app_count"),
        F.size("geos").alias("geo_count"),
        F.expr(
            "aggregate(apps, 0L, (acc, a) -> acc +"
            " aggregate(map_values(a.count_per_exchange), 0L, (x, y) -> x + y))"
        ).alias("total_bids"),
    )


def q_app_profiles_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2-A5: per-app distinct-user counts; slot=-1 is the user-count leg.
    Flat-path formulation (no nested detour); equivalence to
    flatten_app_profiles(app_profiles(...)) is test-checked."""
    return app_profile_slots_from_valid(_valid(spark, sf_dir))


def q_suspicious_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8/J1/R1: rule-based bot detection (flat-path formulation)."""
    return suspicious_ids_from_valid(_valid(spark, sf_dir), QUERY_THRESHOLDS)


def q_feature_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/J3/F6/A6/A7: blacklist anti-join, 1/16 sample, IAPP intersection
    aggregates + the 4 ratio features (flat-path formulation).

    Fused formulation: ONE shared per-device aggregate feeds both the
    suspicious rules and the feature assembly (operators/features.py::
    feature_pipeline_from_valid); the validated frame is persisted so the
    scan+derive chain runs once."""
    from ..functions._cache import hold

    v = hold(_valid(spark, sf_dir), eager=True)
    return feature_pipeline_from_valid(v, load_iapp(spark, sf_dir), QUERY_THRESHOLDS)


def q_profile_cap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 no-silent-caps audit: run the profile aggregation WITH the
    apps-per-device materialization cap engaged and prove zero truncation
    on honest data, the same conservation law the dedup band buckets get
    (dedup_cap_audit). `apps_dropped` is measured against the CAPPED
    implementation's actual output (uncapped distinct-app count minus
    size(apps)), so a capping bug — not just a cap breach — flips the
    audit; the oracle states the closed form sum(max(n_apps - cap, 0))."""
    from ..operators.device_profile import DEFAULT_PROFILE_APP_CAP

    cap = DEFAULT_PROFILE_APP_CAP
    v = _valid(spark, sf_dir)
    kept = device_profiles(v, max_apps_per_device=cap).select(
        "os", "uuid", F.size("apps").alias("kept_apps")
    )
    actual = v.groupBy("os", "uuid").agg(
        F.countDistinct("app_bundle").alias("n_apps")
    )
    return (
        actual.join(kept, ["os", "uuid"])
        .agg(
            F.lit(cap).cast("int").alias("cap"),
            F.count(F.lit(1)).alias("n_devices"),
            F.max("n_apps").cast("int").alias("max_apps"),
            F.sum(
                F.when(F.col("n_apps") > cap, 1).otherwise(0)
            ).alias("n_devices_over_cap"),
            F.sum(F.col("n_apps") - F.col("kept_apps")).alias("apps_dropped"),
        )
    )


def q_predictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2-R4: feature vectors + batched deterministic inference
    (pandas-UDF path; rows-only driver check — not SQL-expressible)."""
    return predict(q_feature_inputs(spark, sf_dir))


# --- general analytics coverage (TPC-H-style over the star schema) ---------
# Query text lives in plans/relational.py (dialect-shared with the oracle).


def _relational(name: str) -> Callable[[SparkSession, str], DataFrame]:
    sql_fn, tables = RELATIONAL_SQL[name]

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_tables(spark, sf_dir, tables)
        return spark.sql(sql_fn("spark"))

    run.__doc__ = sql_fn.__doc__
    return run


def _hygienic(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    """Release the PREVIOUS query's held/persisted intermediates before
    building the next one: a long-lived session running many declared
    queries caches at most one query's worth of frames at a time
    (functions/_cache.py registry)."""
    from ..functions._cache import release_cached

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        release_cached()
        return fn(spark, sf_dir)

    run.__doc__ = fn.__doc__
    return run


_ALL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "bidlog_validation": q_bidlog_validation,
    "device_profiles_flat": q_device_profiles_flat,
    "device_profile_summary": q_device_profile_summary,
    "app_profiles_flat": q_app_profiles_flat,
    "suspicious_ids": q_suspicious_ids,
    "feature_inputs": q_feature_inputs,
    "predictions": q_predictions,
    "profile_cap_audit": q_profile_cap_audit,
    **{name: _relational(name) for name in RELATIONAL_SQL},
    **NORTHSTAR_QUERIES,
    **MAINTENANCE_QUERIES,
}

# The external gate checks the FIRST 50 entries of queries(), so ordering is
# part of the contract: the least-proven queries must sort earliest.
# Round-6 rotation: the 43 non-parity queries gated green in round 5 rotate
# OUT (they re-enter if their code ever changes); the window now holds the 7
# round-6-new audit queries plus the 36 least-proven of the 44 queries whose
# last green row predates round 5 (every query with <= 3 green rows, plus
# pricing_summary as the most load-bearing of the 4-green group).
_GATE_FIRST = [
    # round-6 NEW queries — never gated, so they sort first
    "dup_span_stats",
    "dup_span_clean",
    "bloom_prune_join",
    "stream_top_users",
    "schema_drift_audit",
    "curation_funnel",
    "embedding_quantize_audit",
    "top_supplier_revenue",
    "part_share_suppliers",
    "pit_purchase_state",
    "dup_span_incoming",
    "exact_stratified_sample",
    "forecast_revenue",
    "volume_shipping",
    "market_share",
    "promo_revenue_share",
    "large_volume_customers",
    "idle_rich_customers",
    "dedup_cap_audit",
    "semantic_cap_audit",
    "zorder_audit",
    "range_sort_audit",
    "snapshot_diff_orders",
    "tfexample_roundtrip",
    "shard_manifest",
    "ingest_checkpoint_audit",
    "compaction_audit",
    "ann_recall_audit",
    "salted_hot_join",
    "csv_roundtrip",
    "orc_roundtrip",
    "dedup_incoming_indexed",
    "script_mix",
    "partition_prune_audit",
    "props_json_stats",
    "embedding_bucket_audit",
    # round-6 NEW queries added mid-round (never gated): referential-
    # integrity audit, bigram-LM perplexity filter, deletion-neighborhood
    # record linkage, exact systematic weighted sampler — 0-green beats
    # 1-green, so four of the one-green entries below rotated to the tail
    # (embedding_outliers / frame_sample / monthly_revenue_trend /
    # quiet_returners re-enter first in round 7)
    "fk_integrity_audit",
    "bigram_lm_score",
    "similar_parts",
    "weighted_sample",
    # second mid-round batch (never gated): iterative graph ranking,
    # streaming drift monitor, robust MAD outlier screen — the last three
    # one-green entries (brand_supplier_stats / conversion_funnel /
    # customer_order_distribution) rotate to the tail; the 19 remaining
    # 0-green round-6 queries (frequent_part_pairs, hourly_gapfill,
    # click_attribution, concurrent_sessions, session_concurrency,
    # copurchase_triangles, value_deciles, type_transitions,
    # segment_trend, wide_order_facts, customer_spend_rank, cohort_ltv,
    # embedding_covariance, kmv_overlap, incremental_rollup,
    # cm_error_audit, cdc_customer_state, dim_truncation_recall,
    # stream_attribution_full, stream_cm_sketch, semantic_contamination,
    # nearest_click, weighted_median_price, pareto_documents,
    # funnel_pattern, penny_allocation, activity_streaks, event_pivot —
    # 32 in all) are pytest- and full-board local-compare-proven (BOTH
    # sessions at sf0.01; sf0.1 and conf-matrix coverage recorded in
    # LOCALGATE_r06.json) and queue first for the round-7 window
    "copurchase_pagerank",
    "stream_drift_chi2",
    "user_value_outliers",
    # Rotated OUT to make room for the 18 never-gated round-6 queries
    # (span dedup trio, bloom join, streaming heavy hitters, schema
    # drift, curation funnel, quantize audit, exact sampler, the Q6/Q7/
    # Q8/Q14/Q15/Q18/Q20/Q22 relational set, pit temporal join), 0-green
    # beats 1-2 greens, least-risky first — each rotated query's
    # load-bearing machinery stays re-proven by an in-window sibling:
    #   multimodal_resize (1 green, pure integer geometry) /
    #     sliding_window_counts (1 green, equality-tested vs native
    #     window()) / streaming_device_activity (1 green, and its gate is
    #     the weak rows-only check) — the three 1-green rows whose gate
    #     adds the least marginal proof; first 1-greens back in round 7
    #   pii_redact / source_mix / streaming_sessionize (2 greens)
    #   dedup_minhash / dedup_clusters (3 greens, r6 band-refactor
    #     consumers) — band path gated via dedup_cap_audit +
    #     dedup_incoming_indexed
    #   similarity_lsh_topk / similarity_ivf_topk (3 greens,
    #     r5-rewritten) — signature/centroid chains gated via
    #     embedding_bucket_audit + ann_recall_audit
    #   train_split (2 greens, untouched since r3) — a 10-line pure
    #     md5-threshold expression, the smallest blast radius on the board
    #   vocab_topk / tfidf_top_terms (2 greens, untouched) — both ride
    #     the same shared tf relation; oov_rate's in-window-adjacent
    #     vocab join and the text-suite greens cover the chain
    #   simhash_near_dup / repetition_stats (2 greens, untouched since
    #     their last green) — displaced by the Q15/Q20 relational pair;
    #     first in line to rotate back in for round 7
    #   label_centroids (2 greens, untouched) — displaced by
    #     pit_purchase_state; its micros idiom is re-proven in-window by
    #     embedding_quantize_audit/embedding_outliers every round
    #   length_percentiles (2 greens, untouched pure rank-pick
    #     expression) — displaced by dup_span_incoming; re-enters first
    #     in round 7
    #   packing_plan (2 greens, untouched pure sequence-fill expression)
    #     — displaced by exact_stratified_sample; re-enters first in
    #     round 7
    # similarity_topk's chain is re-proven every round through
    # ann_recall_audit (its exact top-k is that audit's baseline side)
    # The pure-column-expression tail of the 3-green class (lang_id,
    # text_stats, winnowing, doc_fingerprints, multimodal_meta — all
    # untouched since r3) and pricing_summary (4 greens) yield their
    # window slots to the 13 round-6-new audit/format queries.
]
# The tail holds the queries with the MOST recent/most numerous green rows:
# the 43 non-parity round-5-gated queries and the remaining 4-green
# relational set (rotate any back in if its code changes).
_GATE_LAST = [
    "brand_supplier_stats",
    "conversion_funnel",
    "customer_order_distribution",
    "embedding_outliers",
    "frame_sample",
    "monthly_revenue_trend",
    "quiet_returners",
    "similarity_lsh_topk",
    "similarity_ivf_topk",
    "dedup_minhash",
    "dedup_clusters",
    "train_split",
    "vocab_topk",
    "tfidf_top_terms",
    "simhash_near_dup",
    "repetition_stats",
    "label_centroids",
    "length_percentiles",
    "packing_plan",
    "pii_redact",
    "source_mix",
    "streaming_sessionize",
    "multimodal_resize",
    "sliding_window_counts",
    "streaming_device_activity",
    "winnowing",
    "text_stats",
    "lang_id",
    "doc_fingerprints",
    "multimodal_meta",
    "similarity_topk",
    "embedding_near_dup",
    "dedup_simhash",
    "ngram_jaccard",
    "dedup_exact",
    "kmv_user_distinct",
    "quality_expectations",
    "scd2_intervals",
    "key_skew_report",
    "rolling_user_features",
    "quarantined_docs",
    "retention_cohorts",
    "hourly_activity",
    "stream_kmv_distinct",
    "oov_rate",
    "stream_quarantine",
    "image_embed",
    "semantic_dedup",
    "doc_chunks",
    "discounted_revenue",
    "small_quantity_revenue",
    "waiting_suppliers",
    "revenue_rollup",
    "repeat_customers",
    "top_parts_per_brand",
    "dedup_incoming",
    "table_profile",
    "temperature_mix",
    "kmeans_centroids",
    "token_budget_mixture",
    "doc_quality_zipf",
    "shingle_dup_rate",
    "cross_source_overlap",
    "audio_chunks",
    "stratified_sample",
    "dedup_keep_best",
    "contamination_check",
    "curated_corpus",
    "length_histogram",
    "stream_window_counts",
    "stream_sliding_counts",
    "stream_dedup",
    "stream_attribution",
    "stream_attribution_outer",
    "stream_enriched_counts",
    "stream_upsert_latest",
    "stream_session_windows",
    "streaming_spend_sessions",
]
_PARITY = [
    "bidlog_validation",
    "device_profiles_flat",
    "device_profile_summary",
    "app_profiles_flat",
    "suspicious_ids",
    "feature_inputs",
    "predictions",
]
_ORDER = (
    _PARITY
    + _GATE_FIRST
    + [
        n
        for n in _ALL_QUERIES
        if n not in _PARITY and n not in _GATE_FIRST and n not in _GATE_LAST
    ]
    + _GATE_LAST
)
assert sorted(_ORDER) == sorted(_ALL_QUERIES), (
    sorted(set(_ORDER) ^ set(_ALL_QUERIES))
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    name: _hygienic(_ALL_QUERIES[name]) for name in _ORDER
}
