"""Streaming distribution-drift detection.

Monitors the per-window event-type mix against a static baseline
distribution with a chi-square-style statistic — the standard data-quality
monitor in front of a training pipeline ("did the input mix shift this
hour?"). Everything is exact integer arithmetic (micro-proportions,
milli-count expectations, integer cross-multiplied contributions) so the
DuckDB oracle restates the full computation bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# fixed bucket domain: the synthetic event domain plus a catch-all, so the
# output schema is static (a data-driven pivot would make the schema — and
# the oracle — depend on which types happen to appear in a window)
DRIFT_BUCKETS = ["click", "error", "purchase", "signup", "view"]

# chi-square 95th percentile at 5 degrees of freedom ~ 11.07; the
# statistic is reported in milli-units
DRIFT_THRESHOLD_MILLI = 11_070


def _bucket(col: str = "event_type") -> F.Column:
    known = F.col(col).isin(DRIFT_BUCKETS)
    return F.when(known, F.col(col)).otherwise(F.lit("other"))


def stream_drift_chi2(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """Per 1-hour tumbling window: observed event-type mix vs the global
    baseline mix, scored with an integer chi-square statistic.

    Pipeline shape: ONE stateful aggregation (window -> conditional
    per-bucket counts + total; same finalize-once/evict append semantics
    as stream_window_counts), then STATELESS post-agg scoring — the 1-row
    baseline (per-bucket micro-proportions from the static batch table)
    broadcast-cross-joined in, expected counts E_milli = prop_micro *
    n_total div 1000, per-bucket contribution (obs*1000 - E_milli)^2 div
    max(E_milli, 1), summed to chi2_milli. A stateless projection after a
    watermarked agg adds no state; the baseline re-evaluates per
    micro-batch, so refreshing the baseline table lands without a query
    restart (same property as stream_enriched_counts' dimension join).

    Integer bounds: window totals ~1e4, props <= 1e6 -> E_milli <= 1e7,
    diff_milli <= ~1e7, squared <= 1e14 — comfortably inside bigint.

    Output: (window_start_ms, n_total, n_click, n_error, n_purchase,
    n_signup, n_view, n_other, chi2_milli, drifted)."""
    from ..sources.tables import load_table
    from .windowed import _events_stream, _run_to_memory

    ev_b = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    base = ev_b.select(_bucket().alias("b")).agg(
        F.count(F.lit(1)).alias("t_base"),
        *[
            F.sum(F.when(F.col("b") == t, 1).otherwise(0)).alias(f"base_{t}")
            for t in DRIFT_BUCKETS + ["other"]
        ],
    ).select(
        *[
            F.expr(f"(base_{t} * 1000000) div t_base").alias(f"prop_{t}")
            for t in DRIFT_BUCKETS + ["other"]
        ]
    )

    stream = events if events is not None else _events_stream(spark, sf_dir)
    agg = (
        stream.filter(F.col("event_type").isNotNull())
        .select("ts", _bucket().alias("b"))
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            *[
                F.sum(F.when(F.col("b") == t, 1).otherwise(0)).alias(f"n_{t}")
                for t in DRIFT_BUCKETS + ["other"]
            ],
        )
    )
    contribs = [
        f"((n_{t} * 1000 - (prop_{t} * n_total) div 1000)"
        f" * (n_{t} * 1000 - (prop_{t} * n_total) div 1000))"
        f" div (CASE WHEN (prop_{t} * n_total) div 1000 < 1 THEN 1"
        f"           ELSE (prop_{t} * n_total) div 1000 END)"
        for t in DRIFT_BUCKETS + ["other"]
    ]
    scored = (
        agg.crossJoin(F.broadcast(base))
        .select(
            F.col("w"),
            F.col("n_total").cast("bigint").alias("n_total"),
            *[
                F.col(f"n_{t}").cast("bigint").alias(f"n_{t}")
                for t in DRIFT_BUCKETS + ["other"]
            ],
            F.expr(" + ".join(contribs)).cast("bigint").alias("chi2_milli"),
        )
        .withColumn(
            "drifted",
            (F.col("chi2_milli") >= DRIFT_THRESHOLD_MILLI).cast("int"),
        )
    )
    out = _run_to_memory(scored, "append")
    return out.select(
        F.unix_millis(F.col("w.start")).alias("window_start_ms"),
        "n_total",
        *[f"n_{t}" for t in DRIFT_BUCKETS + ["other"]],
        "chi2_milli",
        "drifted",
    )
