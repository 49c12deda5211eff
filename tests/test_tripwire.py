"""Corruption tripwire — table-driven parity with the judge's isDpValid
truth table (java/judge/.../utils/__Test02DeviceProfileUtils.java:61-139).

Note on the OTHER judge file often cited for this (negative DeviceProfiles
in jobs1/__Test04BidLogJob.java:134-220): its loop re-applies each corrupted
profile to the SAME TestPipeline, so after case 0 every iteration aborts
regardless of the new case's validity — cases like `removeGeo(2)` (still
distinct geos) and exchange key 10 (SMAATO, a real enum value) are valid per
isDpValid and only "fail" there because case 0 is still in the graph.
__Test02's per-case fresh-builder table is the authoritative semantics and
is what this file mirrors, case for case, plus the isDeviceIdValid table at
__Test02DeviceProfileUtils.java:40-58.

The sample profile reproduces the reference's exactly
(__Test02DeviceProfileUtils.java:63-76): two apps over [10000, 20000] and
three case-variant geos (usa/ca, usa/CA, USA/ca — country/region are
case-SENSITIVE, so all three are distinct and the baseline is valid).
"""

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

B1, B2, B3 = "edu.usfca.cs.app1", "edu.usfca.cs.app2", "edu.usfca.cs.app3"


def app1():
    # INMOBI=6, MOPUB=2 (__Test02:68-69)
    return {"bundle": B1, "first_at": 10000, "last_at": 12000,
            "count_per_exchange": {6: 2, 2: 3}}


def app2():
    # MOPUB=2, USF=21 (__Test02:70-71)
    return {"bundle": B2, "first_at": 15000, "last_at": 20000,
            "count_per_exchange": {2: 2, 21: 3}}


def good():
    return {
        "os": "IOS",
        # uuid = Bundle1 in the reference — NOT UUID-format; profile-level
        # id validity only requires known os + non-blank uuid (__Test02:42-44)
        "uuid": B1,
        "first_at": 10000,
        "last_at": 20000,
        "apps": [app1(), app2()],
        "geos": [
            {"country": "usa", "region": "ca"},
            {"country": "usa", "region": "CA"},
            {"country": "USA", "region": "ca"},
        ],
    }


def check(spark, mutate):
    p = good()
    mutate(p)
    df = spark.createDataFrame([p], schema=SCHEMA)
    assert_valid_device_profiles(df)


def _third_app(**kw):
    a = dict(app2(), bundle=B3)
    a.update(kw)
    return a


# ---- positive cases: must NOT abort ---------------------------------------

@pytest.mark.parametrize(
    "mutate",
    [
        pytest.param(lambda p: None, id="baseline-3-case-variant-geos"),
        # "UNKNOWN_EXCHANGE has a valid enum value (0)" — spec (3-4)
        pytest.param(
            lambda p: p["apps"][0]["count_per_exchange"].update({0: 1}),
            id="exchange-key-0-valid",
        ),
        # SMAATO=10 is a real enum value (bid.proto:61) — the __Test04 case
        # that *looks* like it forbids key 10 is the stale-pipeline artifact
        pytest.param(
            lambda p: p["apps"].append(_third_app(count_per_exchange={10: 1})),
            id="exchange-key-10-valid",
        ),
        # removing one of three distinct geos keeps them distinct
        pytest.param(lambda p: p["geos"].pop(2), id="fewer-geos-still-distinct"),
        pytest.param(lambda p: p.update(geos=[]), id="empty-geo-list-valid"),
    ],
)
def test_valid_profiles_pass(spark, mutate):
    check(spark, mutate)


# ---- negative cases: each must abort (__Test02:79-139, case for case) -----

@pytest.mark.parametrize(
    "mutate",
    [
        # clearDeviceId: os UNKNOWN + uuid ""
        pytest.param(lambda p: p.update(os="UNKNOWN", uuid=""), id="clear-device-id"),
        pytest.param(lambda p: p.update(os="UNKNOWN"), id="os-cleared"),
        pytest.param(lambda p: p.update(os="UNKNOWN_OS_TYPE"), id="os-unknown"),
        pytest.param(lambda p: p.update(os="WINDOWS"), id="os-out-of-domain"),
        pytest.param(lambda p: p.update(uuid=""), id="uuid-cleared"),
        pytest.param(lambda p: p.update(uuid=" "), id="uuid-space"),
        pytest.param(lambda p: p.update(uuid="\n"), id="uuid-newline"),
        pytest.param(lambda p: p.update(apps=[]), id="apps-cleared"),
        # removeApp(0): min(app.first_at)=15000 != profile.first_at
        pytest.param(lambda p: p.update(apps=[app2()]), id="remove-app0-loose-first"),
        # removeApp(1): max(app.last_at)=12000 != profile.last_at
        pytest.param(lambda p: p.update(apps=[app1()]), id="remove-app1-loose-last"),
        pytest.param(lambda p: p["apps"].append(app1()), id="dup-bundle-app1"),
        pytest.param(lambda p: p["apps"].append(app2()), id="dup-bundle-app2"),
        pytest.param(
            lambda p: p["apps"].append(
                {"bundle": "", "first_at": 12345, "last_at": 12345,
                 "count_per_exchange": {2: 1}}
            ),
            id="blank-bundle",
        ),
        pytest.param(
            lambda p: p["apps"][0].update(bundle="  "), id="whitespace-bundle"
        ),
        pytest.param(
            lambda p: p["apps"].append(_third_app(count_per_exchange={})),
            id="empty-exchange-map",
        ),
        # Exchange.forNumber(15) == null (enum numbers are 0-10, 21, 22)
        pytest.param(
            lambda p: p["apps"].append(_third_app(count_per_exchange={15: 1})),
            id="exchange-key-15",
        ),
        pytest.param(
            lambda p: p["apps"].append(_third_app(count_per_exchange={-1: 1})),
            id="exchange-key-negative",
        ),
        pytest.param(
            lambda p: p["apps"].append(_third_app(count_per_exchange={5: 0})),
            id="exchange-value-zero",
        ),
        pytest.param(
            lambda p: p["apps"].append(_third_app(first_at=20001, last_at=20001)),
            id="app-beyond-profile-last",
        ),
        pytest.param(
            lambda p: p["apps"].append(_third_app(first_at=2001, last_at=2001)),
            id="app-before-profile-first",
        ),
        pytest.param(
            lambda p: p["apps"][0].update(first_at=500, last_at=400),
            id="app-first-gt-last",
        ),
        # clearApp + clearFirstAt / clearLastAt (proto default 0)
        pytest.param(
            lambda p: p.update(apps=[], first_at=0), id="no-apps-first-zero"
        ),
        pytest.param(
            lambda p: p.update(apps=[], last_at=0), id="no-apps-last-zero"
        ),
        pytest.param(
            lambda p: p["geos"].append({"country": "usa", "region": "ca"}),
            id="dup-geo1",
        ),
        pytest.param(
            lambda p: p["geos"].append({"country": "usa", "region": "CA"}),
            id="dup-geo2",
        ),
        pytest.param(
            lambda p: p["geos"].append({"country": "USA", "region": "ca"}),
            id="dup-geo3",
        ),
        pytest.param(
            lambda p: p["geos"].append({"country": "", "region": "nv"}),
            id="blank-country",
        ),
        pytest.param(
            lambda p: p["geos"].append({"country": "usa", "region": ""}),
            id="blank-region",
        ),
        pytest.param(
            lambda p: p["geos"].append({"country": " ", "region": "ca"}),
            id="whitespace-country",
        ),
    ],
)
def test_corrupted_profiles_abort(spark, mutate):
    with pytest.raises(CorruptedDataError):
        check(spark, mutate)
