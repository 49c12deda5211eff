"""Pipeline 1 — the reference's BidLogJob end-to-end
(jobs1/BidLogJob.java:126-154): bid logs -> validate -> DeviceProfiles ->
AppProfiles (+ duplicate tripwire) -> SuspiciousIDs -> three sinks.

The Beam graph's three shuffle boundaries (Combine.perKey, Count.perElement,
Combine.perKey) become Spark hash aggregations with automatic partial
aggregation; the popular-apps side input becomes a broadcast join inside
suspicious_ids. Outputs are written partitioned (parquet) plus optional
Base64-text for format fidelity.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..operators.app_profile import app_profiles
from ..operators.device_profile import device_profiles
from ..operators.suspicious import SuspiciousThresholds, suspicious_ids
from ..operators.validate import valid_bid_logs
from ..sources.codecs import write_b64_text


@dataclass
class BidLogJobResult:
    device_profiles: DataFrame
    app_profiles: DataFrame
    suspicious: DataFrame


def run_bidlog_job(
    spark: SparkSession,
    bid_logs: DataFrame,
    output_dir: str | None = None,
    thresholds: SuspiciousThresholds = SuspiciousThresholds(),
    b64_outputs: bool = False,
) -> BidLogJobResult:
    """Execute pipeline 1. When `output_dir` is set, writes parquet outputs
    (device_profiles/ app_profiles/ suspicious/); `b64_outputs` adds the
    reference's Base64-text format next to them."""
    dp = device_profiles(valid_bid_logs(bid_logs))
    aps = app_profiles(dp)  # includes the duplicate-ID tripwire (A2)
    susp = suspicious_ids(dp, aps, thresholds)

    if output_dir:
        dp.write.mode("overwrite").parquet(os.path.join(output_dir, "device_profiles"))
        aps.write.mode("overwrite").parquet(os.path.join(output_dir, "app_profiles"))
        susp.write.mode("overwrite").parquet(os.path.join(output_dir, "suspicious"))
        if b64_outputs:
            write_b64_text(susp, os.path.join(output_dir, "suspicious_b64"))

    return BidLogJobResult(dp, aps, susp)
