"""AppProfile distinct-user semantics — ports judge __Test04BidLogJob.java
(distinct-user counts incl. per-exchange matrix :271-327; duplicate-ID
abort :332-345)."""

import pytest

from adtech_log_data_pipeline_spark.operators import (
    CorruptedDataError,
    app_profiles,
    assert_unique_device_ids,
    device_profiles,
    valid_bid_logs,
)
from tests.conftest import bid_log, bid_logs_df

U1 = "abcdefab-1234-5678-9abc-def012345678"
U2 = "11111111-2222-3333-4444-555555555555"
U3 = "99999999-8888-7777-6666-555555555555"


def aps(spark, rows):
    dp = device_profiles(valid_bid_logs(bid_logs_df(spark, rows)))
    return {
        r["bundle"]: r.asDict(recursive=True) for r in app_profiles(dp).collect()
    }


def test_distinct_users_not_bid_counts(spark):
    # u1 hits app x on exchange 1 five times; u2 once; user_count must be 2
    rows = [bid_log(device_ifa=U1, bid_id=str(i)) for i in range(5)] + [
        bid_log(device_ifa=U2, bid_id="z")
    ]
    a = aps(spark, rows)["com.app.one"]
    assert a["user_count"] == 2
    assert a["user_count_per_exchange"] == {1: 2}


def test_per_exchange_presence_matrix(spark):
    rows = [
        bid_log(device_ifa=U1, exchange=1),
        bid_log(device_ifa=U1, exchange=2),
        bid_log(device_ifa=U2, exchange=2),
        bid_log(device_ifa=U3, exchange=2, app_bundle="other.app"),
    ]
    a = aps(spark, rows)["com.app.one"]
    assert a["user_count"] == 2
    assert a["user_count_per_exchange"] == {1: 1, 2: 2}
    b = aps(spark, rows)["other.app"]
    assert b["user_count"] == 1 and b["user_count_per_exchange"] == {2: 1}


def test_same_uuid_different_os_are_distinct_users(spark):
    rows = [
        bid_log(device_ifa=U1, device_os="android"),
        bid_log(device_ifa=U1, device_os="ios"),
    ]
    a = aps(spark, rows)["com.app.one"]
    assert a["user_count"] == 2


def test_duplicate_device_ids_abort(spark):
    # two profile rows whose uuids differ only by case = corrupted dataset
    dp = device_profiles(
        valid_bid_logs(bid_logs_df(spark, [bid_log(device_ifa=U1)]))
    )
    dup = dp.union(dp.withColumn("uuid", dp.uuid.substr(1, 36)))  # exact dup
    with pytest.raises(CorruptedDataError):
        assert_unique_device_ids(dup)
