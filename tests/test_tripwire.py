"""Corruption tripwire — ports the negative classes of judge
__Test04BidLogJob.java:134-220 (systematically corrupted DeviceProfiles
must abort the pipeline)."""

import pytest

from adtech_log_data_pipeline_spark.operators import (
    CorruptedDataError,
    assert_valid_device_profiles,
)

SCHEMA = (
    "os string, uuid string, first_at long, last_at long,"
    " apps array<struct<bundle:string, first_at:long, last_at:long,"
    " count_per_exchange:map<int,int>>>,"
    " geos array<struct<country:string, region:string>>"
)


def good():
    return {
        "os": "ANDROID",
        "uuid": "ABCDEFAB-1234-5678-9ABC-DEF012345678",
        "first_at": 100,
        "last_at": 900,
        "apps": [
            {"bundle": "a", "first_at": 100, "last_at": 900, "count_per_exchange": {1: 2}},
        ],
        "geos": [{"country": "USA", "region": "ca"}],
    }


def check(spark, mutate):
    p = good()
    mutate(p)
    df = spark.createDataFrame([p], schema=SCHEMA)
    assert_valid_device_profiles(df)


def test_valid_profile_passes(spark):
    check(spark, lambda p: None)


@pytest.mark.parametrize(
    "mutate",
    [
        lambda p: p.update(os="WINDOWS"),  # invalid os
        lambda p: p.update(uuid=" "),  # blank uuid
        lambda p: p.update(first_at=0),  # first_at must be > 0
        lambda p: p.update(first_at=901),  # first > last
        lambda p: p.update(apps=[]),  # no apps
        lambda p: p["apps"][0].update(bundle="  "),  # blank bundle
        lambda p: p["apps"][0].update(first_at=50),  # app.first < profile.first
        lambda p: p["apps"][0].update(last_at=950),  # app.last > profile.last
        lambda p: p["apps"][0].update(first_at=500, last_at=400),  # app first>last
        lambda p: p["apps"][0].update(count_per_exchange={}),  # empty map
        lambda p: p["apps"][0].update(count_per_exchange={99: 1}),  # bad exchange
        lambda p: p["apps"][0].update(count_per_exchange={1: 0}),  # non-positive
        lambda p: p.update(first_at=50),  # min(app.first) != profile.first
        lambda p: p.update(
            last_at=950,
            apps=[dict(p["apps"][0])],
        ),  # max(app.last) != profile.last
        lambda p: p.update(apps=p["apps"] * 2),  # duplicate bundles
        lambda p: p.update(geos=p["geos"] * 2),  # duplicate geos
        lambda p: p.update(geos=[{"country": " ", "region": "ca"}]),  # blank geo
    ],
)
def test_corrupted_profiles_abort(spark, mutate):
    with pytest.raises(CorruptedDataError):
        check(spark, mutate)
