"""Pipeline 2 — the reference's PredictionJob end-to-end
(jobs2/PredictionJob.java:94-141): DeviceProfiles + suspicious blacklist +
IAPP -> anti-join -> 1/16 sample -> feature assembly -> batched inference
-> JSON sink (+ parquet, the engine's canonical sink; the reference's
BigQuery sink maps to an overwrite write of the same 4-column frame).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.app_profile import assert_unique_device_ids
from ..operators.features import feature_inputs
from ..operators.inference import predict
from ..sources.codecs import write_json_text


def run_prediction_job(
    spark: SparkSession,
    device_profiles: DataFrame,
    suspicious: DataFrame,
    iapp: DataFrame,
    output_dir: str | None = None,
) -> DataFrame:
    """Execute pipeline 2; returns the predictions frame
    (os, uuid, prediction, score)."""
    # duplicate-ID tripwire on the re-read profiles (Features.java:81-87)
    assert_unique_device_ids(device_profiles)
    preds = predict(feature_inputs(device_profiles, suspicious, iapp))

    if output_dir:
        preds.write.mode("overwrite").parquet(os.path.join(output_dir, "predictions"))
        write_json_text(preds, os.path.join(output_dir, "predictions_json"))

    return preds
