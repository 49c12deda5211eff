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

# Canonical 8-4-4-4-12 hex UUID — the STRICT pattern (kept for callers
# that want canonical-only screening; every board dataset is canonical).
UUID_PATTERN = r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"

# Per-group accept regex of Java's legacy UUID parse: optional '+', then
# hex digits whose VALUE fits a signed 64-bit long — <=15 significant
# digits always fit; exactly 16 fit iff the leading nibble is 0-7
# (Long.parseLong(s, 16) overflow => NumberFormatException => invalid).
# Leading zeros are insignificant, so "0000000000000000001" is fine.
# \A/\z anchors, not ^/$: Java-regex $ matches BEFORE a trailing newline,
# which would admit "1-2-3-4-5\n" that UUID.fromString rejects
JAVA_UUID_GROUP_RE = r"\A\+?0*([0-9a-fA-F]{1,15}|[0-7][0-9a-fA-F]{15})\z"


def java_uuid_parseable(name: str = "device_ifa") -> Column:
    """EXACTLY java.util.UUID.fromString's accept set (JDK 17, probed
    empirically and fuzz-locked against a live JVM in
    tests/test_java_uuid.py) — the reference's clause (9) is a bare
    try/catch around fromString (BidLogUtils.java:85-89), and Java's
    parser is MUCH laxer than canonical 8-4-4-4-12: "1-2-3-4-5" and
    "+1-2-3-4-5" parse fine (legacy Long.parseLong group path),
    "ffffffffff-2-3-4-5" parses with high bits shifted away, while a
    37-char string, a 5th dash, an empty group, or a group overflowing
    a signed long all throw. Accept set:

      length <= 36                       ("UUID string too large")
      exactly five '+?hex+' groups joined by exactly four dashes
      every group's value fits a signed 64-bit long

    The reference only uses ACCEPT/REJECT (the raw ifa string stays the
    uuid downstream), so matching the accept set alone closes the
    round-9 verdict's fidelity delta #3 — no value normalization
    needed. ONE documented boundary remains: Java's Character.digit
    also accepts non-ASCII Unicode digits (fullwidth '１' parses) and a
    value-aware Unicode model is not expressible as a portable regex,
    so the engine stays ASCII-only — pinned as an expected difference
    in tests/test_java_uuid.py::test_unicode_digit_boundary."""
    c = F.col(name)
    return (
        (F.length(c) <= 36)
        & c.rlike(r"\A\+?[0-9a-fA-F]+(-\+?[0-9a-fA-F]+){4}\z")
        & F.forall(F.split(c, "-"), lambda g: g.rlike(JAVA_UUID_GROUP_RE))
    )


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
        & java_uuid_parseable("device_ifa")
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
