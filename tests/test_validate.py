"""Validation truth table — ports the semantic cases of the reference's
isValid tests (judge __Test01BidLogUtils.java: whitespace-blank bundles
:177-180, bad UUID :168-175, price/result consistency :144-147)."""

import pytest

from adtech_log_data_pipeline_spark.operators import valid_bid_logs
from tests.conftest import bid_log, bid_logs_df


def n_valid(spark, rows):
    return valid_bid_logs(bid_logs_df(spark, rows)).count()


def test_valid_row_passes(spark):
    assert n_valid(spark, [bid_log()]) == 1


@pytest.mark.parametrize(
    "override",
    [
        {"exchange": 0},  # UNKNOWN exchange
        {"exchange": 11},  # not a member of the enum
        {"bid_result": 0},  # UNKNOWN result
        {"bid_price": 0},  # BID requires positive price
        {"bid_result": 2, "bid_price": 5},  # non-BID requires zero price
        {"received_at": 0},
        {"processed_at": 1_000_000},  # must be > received_at
        {"device_os": "winphone"},
        {"device_os": ""},
        {"device_ifa": "not-a-uuid"},  # 3 groups
        {"device_ifa": "abcdefab-1234-5678-9abc-def012345678-0"},  # 6 groups
        {"device_ifa": ""},
        {"app_bundle": "  "},  # whitespace-blank
        {"app_bundle": ""},
        {"geo_country": " "},
        {"geo_region": ""},
    ],
)
def test_invalid_rows_dropped(spark, override):
    assert n_valid(spark, [bid_log(**override)]) == 0


@pytest.mark.parametrize("os_str", ["android", "Android", "ANDROID", "iOS", "ios", "IOS"])
def test_os_case_insensitive(spark, os_str):
    df = valid_bid_logs(bid_logs_df(spark, [bid_log(device_os=os_str)]))
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["os"] in ("ANDROID", "IOS")


def test_java_lax_uuid_forms_are_valid(spark):
    """Round-10 parity fix: clause (9) is java.util.UUID.fromString's
    accept set (BidLogUtils.java:85-89), which admits legacy short-group
    forms — the old strict 8-4-4-4-12 screen was a documented deviation,
    now closed (fuzz-locked against a live JVM in test_java_uuid.py)."""
    for ifa in (
        "abcdefab-1234-5678-9abc-def01234567",  # short last group
        "1-2-3-4-5",
        "+1-2-3-4-5",
    ):
        assert n_valid(spark, [bid_log(device_ifa=ifa)]) == 1, ifa


def test_canonical_identity_uppercases_uuid(spark):
    df = valid_bid_logs(
        bid_logs_df(spark, [bid_log(device_ifa="abcdefab-1234-5678-9abc-def012345678")])
    )
    assert df.collect()[0]["uuid"] == "ABCDEFAB-1234-5678-9ABC-DEF012345678"


def test_non_bid_results_valid_with_zero_price(spark):
    rows = [bid_log(bid_id=str(r), bid_result=r, bid_price=0) for r in (2, 3, 4)]
    assert n_valid(spark, rows) == 3
