"""Feature-input assembly for the prediction job (reference:
transforms/Features.java:55-130 + utils/PredictionUtils.java:35-57;
SURVEY.md §2 J2/J3/F6/F7/A6/A7/R2).

Pipeline: DeviceProfiles
  -> broadcast LEFT-ANTI join against the suspicious blacklist (J2; the
     reference compares DeviceId protos exactly — os + uuid, case as given)
  -> deterministic 1/16 sample: canonical uuid char at index 7 == '0'
     (F6; Features.java:116)
  -> per-device intersection with the in-app-purchase dimension via
     broadcast INNER join on bundle (J3/A7), keeping devices with no
     match through a LEFT join from the sampled side (coalesce 0)
  -> 4 ratio features against the global IAPP scalars (A6)

Everything is native DataFrame ops; the only Python is the downstream
feature-vector/inference UDF (inference.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def feature_inputs(
    profiles: DataFrame,
    suspicious: DataFrame,
    iapp: DataFrame,
) -> DataFrame:
    """Per kept device: intersection aggregates + ratio features.

    Output: os, uuid, first_at, app_count, intersect_app,
    intersect_purchaser, intersect_amount, f486, f586, f686, f777.

    Ratio slots (PredictionUtils.java:39-55):
      f486 = intersect_app / (1 + |IAPP|)
      f686 = intersect_app / (1 + app_count)
      f586 = intersect_purchaser / (1 + total_purchasers)
      f777 = intersect_amount / (1 + total_amount)
    """
    from .skew import routed_anti_join

    kept = (
        routed_anti_join(profiles, suspicious, ["os", "uuid"])
        .filter(F.substring(F.col("uuid"), 8, 1) == "0")
        .select("os", "uuid", "first_at", F.size("apps").alias("app_count"), "apps")
    )

    device_apps = kept.select(
        "os", "uuid", F.explode(F.col("apps.bundle")).alias("bundle")
    )
    matched = (
        device_apps.join(F.broadcast(iapp), "bundle", "inner")
        .groupBy("os", "uuid")
        .agg(
            F.count(F.lit(1)).alias("intersect_app"),
            F.sum("num_purchasers").alias("intersect_purchaser"),
            F.sum("total_amount").alias("intersect_amount"),
        )
    )

    # Global IAPP scalars (A6) — a 1-row aggregate cross-joined (broadcast)
    # onto the device rows; equivalent to the reference's driver-side map
    # scan, but stays distributed and plan-visible.
    totals = iapp.agg(
        F.count(F.lit(1)).alias("iapp_size"),
        # coalesce: an empty IAPP must yield 0 totals (ratios 0), not NULLs
        # (reference empty-map edge case, judge __Test11:104-127)
        F.coalesce(F.sum("num_purchasers"), F.lit(0)).alias("total_purchasers"),
        F.coalesce(F.sum("total_amount"), F.lit(0)).alias("total_amount_sum"),
    )

    out = (
        kept.drop("apps")
        .join(matched, ["os", "uuid"], "left")
        .fillna(0, ["intersect_app", "intersect_purchaser", "intersect_amount"])
        .crossJoin(F.broadcast(totals))
    )
    return out.select(
        "os",
        "uuid",
        "first_at",
        "app_count",
        "intersect_app",
        "intersect_purchaser",
        "intersect_amount",
        (F.col("intersect_app") / (F.lit(1) + F.col("iapp_size"))).alias("f486"),
        (F.col("intersect_purchaser") / (F.lit(1) + F.col("total_purchasers"))).alias("f586"),
        (F.col("intersect_app") / (F.lit(1) + F.col("app_count"))).alias("f686"),
        (F.col("intersect_amount") / (F.lit(1) + F.col("total_amount_sum"))).alias("f777"),
    )


def feature_pipeline_from_valid(
    valid_logs: DataFrame,
    iapp: DataFrame,
    thresholds=None,
) -> DataFrame:
    """Fused flat-path pipeline: suspicious detection AND feature assembly
    off ONE shared per-device aggregate — a single shuffle over the fact
    produces (first_at, app_count, geo_cnt, total_bids) for both consumers
    (separately, suspicious_ids_from_valid and feature_inputs_from_valid
    each re-aggregate the fact). Output identical to
    feature_inputs_from_valid(v, suspicious_ids_from_valid(v, t), iapp) —
    oracle- and test-checked."""
    from .suspicious import SuspiciousThresholds

    t = thresholds or SuspiciousThresholds()
    from ..functions._cache import hold

    device_apps = hold(
        valid_logs.select("os", "uuid", F.col("app_bundle").alias("bundle")).distinct(),
        # lazy hold (r13): the first consumer's action fills the cache;
        # concurrent fills are serialized per partition by the block
        # manager, so an upfront count is pure added latency (see hold())
    )

    dev_stats = valid_logs.groupBy("os", "uuid").agg(
        F.min("received_at").alias("first_at"),
        F.countDistinct("app_bundle").cast("int").alias("app_count"),
        F.countDistinct("geo_country", "geo_region").alias("geo_cnt"),
        F.count(F.lit(1)).alias("total_bids"),
    )

    popular = (
        device_apps.groupBy("bundle")
        .agg(F.countDistinct("os", "uuid").alias("user_count"))
        .filter(F.col("user_count") > t.user_count)
        .select("bundle")
    )
    # J1 capacity routing (SURVEY §4 ladder): device_apps is HELD, so the
    # router's probe is a cache read. Board fixtures → rung 1 (broadcast).
    from .skew import routed_anti_join

    unpopular_counts = (
        routed_anti_join(device_apps, popular, "bundle")
        .groupBy("os", "uuid")
        .agg(F.count(F.lit(1)).alias("unpopular_apps"))
    )

    kept = (
        dev_stats.join(unpopular_counts, ["os", "uuid"], "left")
        .withColumn("unpopular_apps", F.coalesce(F.col("unpopular_apps"), F.lit(0)))
        .filter(
            ~(
                (F.col("geo_cnt") > t.geo_count)
                | (F.col("unpopular_apps") > t.app_count)
                | (F.col("total_bids") > t.bid_log_count)
            )
        )
        .filter(F.substring(F.col("uuid"), 8, 1) == "0")
        .select("os", "uuid", "first_at", "app_count")
    )

    matched = (
        device_apps.join(kept.select("os", "uuid"), ["os", "uuid"], "left_semi")
        .join(F.broadcast(iapp), "bundle", "inner")
        .groupBy("os", "uuid")
        .agg(
            F.count(F.lit(1)).alias("intersect_app"),
            F.sum("num_purchasers").alias("intersect_purchaser"),
            F.sum("total_amount").alias("intersect_amount"),
        )
    )
    totals = iapp.agg(
        F.count(F.lit(1)).alias("iapp_size"),
        F.coalesce(F.sum("num_purchasers"), F.lit(0)).alias("total_purchasers"),
        F.coalesce(F.sum("total_amount"), F.lit(0)).alias("total_amount_sum"),
    )
    out = (
        kept.join(matched, ["os", "uuid"], "left")
        .fillna(0, ["intersect_app", "intersect_purchaser", "intersect_amount"])
        .crossJoin(F.broadcast(totals))
    )
    return out.select(
        "os",
        "uuid",
        "first_at",
        "app_count",
        "intersect_app",
        "intersect_purchaser",
        "intersect_amount",
        (F.col("intersect_app") / (F.lit(1) + F.col("iapp_size"))).alias("f486"),
        (F.col("intersect_purchaser") / (F.lit(1) + F.col("total_purchasers"))).alias("f586"),
        (F.col("intersect_app") / (F.lit(1) + F.col("app_count"))).alias("f686"),
        (F.col("intersect_amount") / (F.lit(1) + F.col("total_amount_sum"))).alias("f777"),
    )


def feature_inputs_from_valid(
    valid_logs: DataFrame,
    suspicious: DataFrame,
    iapp: DataFrame,
) -> DataFrame:
    """Scale-optimized formulation of feature_inputs straight from the flat
    validated rows (same output, oracle-checked): per-device first_at and
    app_count come from one codegen hash agg, the IAPP intersection from
    the distinct device-app pairs — no nested arrays anywhere."""
    from .skew import routed_anti_join

    dev = routed_anti_join(
        valid_logs.groupBy("os", "uuid").agg(
            F.min("received_at").alias("first_at"),
            F.countDistinct("app_bundle").cast("int").alias("app_count"),
        ),
        suspicious,
        ["os", "uuid"],
    ).filter(F.substring(F.col("uuid"), 8, 1) == "0")
    device_apps = (
        valid_logs.select("os", "uuid", F.col("app_bundle").alias("bundle"))
        .distinct()
        .join(dev.select("os", "uuid"), ["os", "uuid"], "left_semi")
    )
    matched = (
        device_apps.join(F.broadcast(iapp), "bundle", "inner")
        .groupBy("os", "uuid")
        .agg(
            F.count(F.lit(1)).alias("intersect_app"),
            F.sum("num_purchasers").alias("intersect_purchaser"),
            F.sum("total_amount").alias("intersect_amount"),
        )
    )
    totals = iapp.agg(
        F.count(F.lit(1)).alias("iapp_size"),
        F.coalesce(F.sum("num_purchasers"), F.lit(0)).alias("total_purchasers"),
        F.coalesce(F.sum("total_amount"), F.lit(0)).alias("total_amount_sum"),
    )
    out = (
        dev.join(matched, ["os", "uuid"], "left")
        .fillna(0, ["intersect_app", "intersect_purchaser", "intersect_amount"])
        .crossJoin(F.broadcast(totals))
    )
    return out.select(
        "os",
        "uuid",
        "first_at",
        "app_count",
        "intersect_app",
        "intersect_purchaser",
        "intersect_amount",
        (F.col("intersect_app") / (F.lit(1) + F.col("iapp_size"))).alias("f486"),
        (F.col("intersect_purchaser") / (F.lit(1) + F.col("total_purchasers"))).alias("f586"),
        (F.col("intersect_app") / (F.lit(1) + F.col("app_count"))).alias("f686"),
        (F.col("intersect_amount") / (F.lit(1) + F.col("total_amount_sum"))).alias("f777"),
    )
