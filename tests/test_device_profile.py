"""Device-profile merge laws — ports the reference's transform-level tests
(judge __Test03BidLogJob.java: case-insensitive uuid merge :253-283,
case-sensitive bundles :303-306, case-sensitive geos :338-346, count
summation on duplicated input :565-590)."""

from adtech_log_data_pipeline_spark.operators import device_profiles, valid_bid_logs
from tests.conftest import bid_log, bid_logs_df

UUID = "abcdefab-1234-5678-9abc-def012345678"


def profiles(spark, rows):
    return {
        (r["os"], r["uuid"]): r.asDict(recursive=True)
        for r in device_profiles(valid_bid_logs(bid_logs_df(spark, rows))).collect()
    }


def test_uuid_case_insensitive_merge(spark):
    rows = [
        bid_log(device_ifa=UUID.lower(), received_at=100, processed_at=101),
        bid_log(device_ifa=UUID.upper(), received_at=200, processed_at=201),
    ]
    ps = profiles(spark, rows)
    assert len(ps) == 1
    p = ps[("ANDROID", UUID.upper())]
    assert p["first_at"] == 100 and p["last_at"] == 200
    assert len(p["apps"]) == 1
    assert p["apps"][0]["count_per_exchange"] == {1: 2}


def test_bundles_case_sensitive(spark):
    rows = [
        bid_log(app_bundle="Bundle1"),
        bid_log(app_bundle="BUNDLE1"),
    ]
    ps = profiles(spark, rows)
    (p,) = ps.values()
    assert sorted(a["bundle"] for a in p["apps"]) == ["BUNDLE1", "Bundle1"]


def test_geos_case_sensitive_and_distinct(spark):
    rows = [
        bid_log(geo_country="usa", geo_region="ca"),
        bid_log(geo_country="Usa", geo_region="ca"),
        bid_log(geo_country="USA", geo_region="ca"),
        bid_log(geo_country="USA", geo_region="ca"),  # duplicate collapses
    ]
    (p,) = profiles(spark, rows).values()
    assert len(p["geos"]) == 3


def test_count_per_exchange_sums_duplicates(spark):
    rows = [bid_log(exchange=3)] * 5 + [bid_log(exchange=7)] * 2
    (p,) = profiles(spark, rows).values()
    assert p["apps"][0]["count_per_exchange"] == {3: 5, 7: 2}


def test_app_time_bounds_and_profile_bounds(spark):
    rows = [
        bid_log(app_bundle="a", received_at=50, processed_at=51),
        bid_log(app_bundle="a", received_at=900, processed_at=901),
        bid_log(app_bundle="b", received_at=400, processed_at=401),
    ]
    (p,) = profiles(spark, rows).values()
    apps = {a["bundle"]: a for a in p["apps"]}
    assert apps["a"]["first_at"] == 50 and apps["a"]["last_at"] == 900
    assert apps["b"]["first_at"] == 400 and apps["b"]["last_at"] == 400
    assert p["first_at"] == 50 and p["last_at"] == 900


def test_devices_keyed_by_os_and_uuid(spark):
    other = "11111111-2222-3333-4444-555555555555"
    rows = [
        bid_log(),
        bid_log(device_os="ios", bid_id="b2"),
        bid_log(device_ifa=other, bid_id="b3"),
    ]
    ps = profiles(spark, rows)
    assert len(ps) == 3


def test_app_cap_truncates_array_only_keeps_bounds_exact(spark):
    """The apps-per-device materialization cap: keeps the N most-ACTIVE
    apps (ties by bundle), but device-level first_at/last_at/geos still
    aggregate over ALL apps — truncation bounds the row, never corrupts
    the reference's merge-law bounds (DeviceProfileUtils.java:206-240)."""
    rows = [
        # app 'busy' x3 (latest activity), 'mid' x2, 'rare' x1 with the
        # extreme time bounds and a unique geo — the DROPPED app must
        # still contribute bounds + geo
        bid_log(app_bundle="busy", received_at=500, processed_at=501),
        bid_log(app_bundle="busy", received_at=600, processed_at=601),
        bid_log(app_bundle="busy", received_at=700, processed_at=701),
        bid_log(app_bundle="mid", received_at=400, processed_at=401),
        bid_log(app_bundle="mid", received_at=450, processed_at=451),
        bid_log(
            app_bundle="rare", received_at=100, processed_at=9000,
            geo_country="ZZZ", geo_region="zz",
        ),
    ]
    v = valid_bid_logs(bid_logs_df(spark, rows))
    capped = {
        (r["os"], r["uuid"]): r.asDict(recursive=True)
        for r in device_profiles(v, max_apps_per_device=2).collect()
    }
    (p,) = capped.values()
    assert [a["bundle"] for a in p["apps"]] == ["busy", "mid"]
    assert p["first_at"] == 100 and p["last_at"] == 700  # rare still counts
    assert ("ZZZ", "zz") in {(g["country"], g["region"]) for g in p["geos"]}

    # a cap >= the true app count is the identity — bit-identical profiles
    uncapped = device_profiles(v).collect()
    wide = device_profiles(v, max_apps_per_device=10_000).collect()
    assert sorted(map(repr, uncapped)) == sorted(map(repr, wide))


def test_app_cap_activity_then_bundle_tiebreak(spark):
    """Equal-activity apps are kept/dropped deterministically by bundle
    order; size(apps) == least(n_apps, cap) — the profile_cap_audit
    conservation law."""
    rows = [
        bid_log(app_bundle=b, received_at=100 + i, processed_at=200 + i)
        for i, b in enumerate(["cc", "aa", "dd", "bb"])
    ]
    v = valid_bid_logs(bid_logs_df(spark, rows))
    (p,) = device_profiles(v, max_apps_per_device=3).collect()
    assert [a["bundle"] for a in p.asDict(recursive=True)["apps"]] == [
        "aa", "bb", "cc",
    ]
