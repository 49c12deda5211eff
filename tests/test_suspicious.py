"""Suspicious-ID rules at the reference's default thresholds (4/3/8/10) —
ports judge __Test05/__Test06 semantics, incl. popularity flipping a user
non-suspicious (:100-168)."""

from adtech_log_data_pipeline_spark.operators import (
    SuspiciousThresholds,
    app_profiles,
    device_profiles,
    suspicious_ids,
    valid_bid_logs,
)
from tests.conftest import bid_log, bid_logs_df

DEFAULTS = SuspiciousThresholds()  # 4 / 3 / 8 / 10


def uuid_n(n):
    return f"{n:08d}-1111-2222-3333-444444444444"


def susp(spark, rows, thresholds=DEFAULTS):
    dp = device_profiles(valid_bid_logs(bid_logs_df(spark, rows)))
    return {
        (r["os"], r["uuid"]) for r in suspicious_ids(dp, app_profiles(dp), thresholds).collect()
    }


def test_quiet_device_not_suspicious(spark):
    rows = [bid_log(bid_id=str(i), exchange=1 + i % 3) for i in range(5)]
    assert susp(spark, rows) == set()


def test_geo_rule(spark):
    # 9 distinct regions > GEO_T=8; only 9 bids <= BID_T=10; 1 app
    rows = [
        bid_log(bid_id=str(i), geo_region=f"r{i}") for i in range(9)
    ]
    assert len(susp(spark, rows)) == 1


def test_bid_count_rule(spark):
    rows = [bid_log(bid_id=str(i)) for i in range(11)]  # 11 > 10
    assert len(susp(spark, rows)) == 1


def test_unpopular_app_rule_and_popularity_flip(spark):
    # device u0 has 4 niche apps (> APP_T=3), 4 bids, 1 geo -> suspicious
    rows = [bid_log(device_ifa=uuid_n(0), bid_id=f"a{i}", app_bundle=f"niche.{i}") for i in range(4)]
    assert len(susp(spark, rows)) == 1

    # now 5 other devices also use each app -> user_count=6 > USER_T=4 ->
    # all apps popular -> u0 no longer suspicious (the flip in __Test06)
    for d in range(1, 6):
        rows += [
            bid_log(device_ifa=uuid_n(d), bid_id=f"d{d}-{i}", app_bundle=f"niche.{i}")
            for i in range(4)
        ]
    assert susp(spark, rows) == set()


def test_rules_emit_each_device_once(spark):
    # device violates geo AND bid rules -> still exactly one output row
    rows = [bid_log(bid_id=str(i), geo_region=f"r{i}") for i in range(12)]
    dp = device_profiles(valid_bid_logs(bid_logs_df(spark, rows)))
    out = suspicious_ids(dp, app_profiles(dp), DEFAULTS).collect()
    assert len(out) == 1
