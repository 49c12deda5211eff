"""Bid-log validation — the reference's `BidLogUtils.isValid` as one
boolean column expression (reference: java/dataflow/src/main/java/edu/usfca/
dataflow/utils/BidLogUtils.java:63-97, spec in comments 35-61).

Eleven clauses, all evaluated JVM-side inside whole-stage codegen — the
filter sits directly on the scan so Catalyst can push the cheap conjuncts
into the parquet reader and prune everything else. No Python in the hot
path.

Case rules (SURVEY.md §1.2): os is case-INsensitive ("Android" == "ANDROID"),
uuid is case-INsensitive and must parse as a UUID, bundle/country/region are
case-SENSITIVE and must be non-blank.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Exchange enum numbers 1-10, 21, 22 (reference: java/dataflow/src/proto/
# bid.proto:50-64); 0 = UNKNOWN = invalid. BidResult 1-4 valid, 0 invalid.
VALID_EXCHANGES: tuple[int, ...] = (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 21, 22)

# Canonical 8-4-4-4-12 hex UUID. Java's UUID.fromString is laxer (accepts
# short groups) but every dataset uses canonical form (SURVEY.md §2.2 F1).
UUID_PATTERN = r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"


def _non_blank(name: str) -> Column:
    # StringUtils.isBlank semantics: blank iff NO non-whitespace char —
    # covers "\n"/"\t" padding that a space-only trim() would miss.
    return F.col(name).rlike(r"\S")


def is_valid_bidlog() -> Column:
    """The 11-clause validity predicate over a bid_logs-schema DataFrame."""
    bid = F.col("bid_result") == F.lit(1)  # BidResult.BID
    return (
        F.col("exchange").isin(*VALID_EXCHANGES)
        & F.col("bid_result").isin(1, 2, 3, 4)
        # bid_price > 0 iff the auction produced a BID
        & (F.when(bid, F.col("bid_price") > 0).otherwise(F.col("bid_price") == 0))
        & (F.col("received_at") > 0)
        & (F.col("processed_at") > F.col("received_at"))
        & F.lower(F.col("device_os")).isin("android", "ios")
        & F.col("device_ifa").rlike(UUID_PATTERN)
        & _non_blank("app_bundle")
        & _non_blank("geo_country")
        & _non_blank("geo_region")
    )


def valid_bid_logs(bid_logs: DataFrame) -> DataFrame:
    """Filter to valid logs and attach the canonical device identity
    (reference: getOsType at BidLogUtils.java:104-112; uuid upper-casing at
    BidLogUtils.java:134 / key at jobs1/BidLogJob.java:113).

    Adds `os` ("ANDROID"/"IOS") and `uuid` (upper-cased) — the composite
    grouping key used by every downstream aggregation (SURVEY.md §2.3 K1:
    key columns, not concatenated strings, so joins/aggs hash-partition on
    real columns and AQE can see the key statistics).
    """
    return bid_logs.filter(is_valid_bidlog()).withColumns(
        {
            "os": F.upper(F.col("device_os")),
            "uuid": F.upper(F.col("device_ifa")),
        }
    )
