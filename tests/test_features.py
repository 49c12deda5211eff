"""Feature assembly — ports judge __Test11PredictionUtils semantics (ratio
features to 1e-4 incl. the empty-IAPP edge case :104-127), the 1/16 sample
determinism (Features.java:116), and the blacklist anti-join (J2)."""

import pytest

from adtech_log_data_pipeline_spark.operators import feature_inputs

DP_SCHEMA = (
    "os string, uuid string, first_at long, last_at long,"
    " apps array<struct<bundle:string, first_at:long, last_at:long,"
    " count_per_exchange:map<int,int>>>,"
    " geos array<struct<country:string, region:string>>"
)
IAPP_SCHEMA = "bundle string, num_purchasers long, total_amount long"
SUSP_SCHEMA = "os string, uuid string"

# uuid with '0' at index 7 -> survives the 1/16 sample
SAMPLED = "ABCDEF00-1111-2222-3333-444444444444"
UNSAMPLED = "ABCDEFA1-1111-2222-3333-444444444444"


def dp_row(uuid, bundles):
    return {
        "os": "ANDROID",
        "uuid": uuid,
        "first_at": 100,
        "last_at": 900,
        "apps": [
            {"bundle": b, "first_at": 100, "last_at": 900, "count_per_exchange": {1: 1}}
            for b in bundles
        ],
        "geos": [{"country": "USA", "region": "ca"}],
    }


def run(spark, dps, susp, iapp):
    return {
        r["uuid"]: r.asDict()
        for r in feature_inputs(
            spark.createDataFrame(dps, DP_SCHEMA),
            spark.createDataFrame(susp, SUSP_SCHEMA),
            spark.createDataFrame(iapp, IAPP_SCHEMA),
        ).collect()
    }


def test_sample_filter_is_1_of_16_on_uuid_char8(spark):
    out = run(
        spark,
        [dp_row(SAMPLED, ["a"]), dp_row(UNSAMPLED, ["a"])],
        [],
        [("a", 10, 100)],
    )
    assert set(out) == {SAMPLED}


def test_blacklist_anti_join(spark):
    out = run(
        spark,
        [dp_row(SAMPLED, ["a"])],
        [("ANDROID", SAMPLED)],
        [("a", 10, 100)],
    )
    assert out == {}


def test_intersection_aggregates_and_ratios(spark):
    iapp = [("a", 10, 100), ("b", 5, 200), ("zzz", 1, 17)]  # zzz unmatched
    out = run(spark, [dp_row(SAMPLED, ["a", "b", "c"])], [], iapp)
    f = out[SAMPLED]
    assert f["app_count"] == 3
    assert f["intersect_app"] == 2
    assert f["intersect_purchaser"] == 15
    assert f["intersect_amount"] == 300
    assert f["f486"] == pytest.approx(2 / (1 + 3), abs=1e-9)  # |IAPP|=3
    assert f["f586"] == pytest.approx(15 / (1 + 16), abs=1e-9)
    assert f["f686"] == pytest.approx(2 / (1 + 3), abs=1e-9)
    assert f["f777"] == pytest.approx(300 / (1 + 317), abs=1e-9)


def test_empty_iapp_edge_case(spark):
    # reference __Test11:104-127 — no purchase data at all; ratios are 0,
    # devices still emitted
    out = run(spark, [dp_row(SAMPLED, ["a"])], [], [])
    f = out[SAMPLED]
    assert f["intersect_app"] == 0 and f["intersect_purchaser"] == 0
    assert f["f486"] == 0.0 and f["f586"] == 0.0 and f["f686"] == 0.0 and f["f777"] == 0.0


def test_device_with_no_matching_apps_kept(spark):
    out = run(spark, [dp_row(SAMPLED, ["c"])], [], [("a", 10, 100)])
    f = out[SAMPLED]
    assert f["intersect_app"] == 0
    assert f["f686"] == 0.0
