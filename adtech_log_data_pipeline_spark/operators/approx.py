"""Approximate aggregates — the 100 TB path for distinct-style statistics.

Exact distinct-user counts (app_profile.py) shuffle every (bundle, device)
pair; at petabyte scale the HyperLogLog sketch version holds fixed-size
state per group and one map-side pass. rsd=0.016 squeezes typical error to
~1.6% at default precision — fine for popularity ranking, not for the
oracle gate (approx results are engine-specific, so these surface as
engine API + tests, not declared oracle queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_app_user_counts(valid_logs: DataFrame, rsd: float = 0.016) -> DataFrame:
    """Approximate distinct users per bundle (HyperLogLog++):
    (bundle, approx_users). The sketch-based analog of A4/A5."""
    return (
        valid_logs.groupBy(F.col("app_bundle").alias("bundle"))
        .agg(
            F.approx_count_distinct(
                F.concat_ws("$", "os", "uuid"), rsd=rsd
            ).alias("approx_users")
        )
    )


def device_activity_percentiles(valid_logs: DataFrame) -> DataFrame:
    """Approximate quantiles of per-device activity (bids per device) —
    percentile_approx, the streaming-sketch quantile path."""
    per_device = valid_logs.groupBy("os", "uuid").agg(
        F.count(F.lit(1)).alias("n_bids")
    )
    return per_device.agg(
        F.percentile_approx("n_bids", [0.5, 0.9, 0.99], 10000).alias("p50_p90_p99"),
        F.max("n_bids").alias("max_bids"),
    )
