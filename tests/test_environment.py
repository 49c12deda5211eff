"""Environment tripwire — names dependency-bump breakage fast.

Round 2 lesson: PySpark 4.1.2 changed how parquet TIMESTAMP(NANOS) loads
(``nanosAsLong`` became a no-op; ``events.ts`` arrived as timestamp_ntz),
and the failure surfaced only as 12 opaque oracle ERRs. These 1-second
assertions pin the invariants every downstream query relies on, so the
next environment change fails HERE with a named cause.
"""

from __future__ import annotations

import pyspark
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from adtech_log_data_pipeline_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_events_ts_is_session_tz_timestamp(spark):
    """load_table must yield TimestampType (LTZ) for events.ts on every
    Spark version — bigint-nanos (<=4.0 + nanosAsLong) and timestamp_ntz
    (4.1+) must both be normalized at the source chokepoint."""
    df = load_table(spark, SF_DIR, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType), (
        f"events.ts loaded as {df.schema['ts'].dataType} on PySpark "
        f"{pyspark.__version__}; sources/tables.py::_normalize_event_ts "
        "must cover this dtype"
    )


def test_events_ts_unix_millis_analyzes(spark):
    """unix_millis(ts) is the epoch-ms bridge to the DuckDB oracle
    (epoch_ms); it rejects NTZ at analysis time, so this catches the
    round-2 class of failure in one named test."""
    df = load_table(spark, SF_DIR, "events")
    row = df.select(F.unix_millis("ts").alias("ms")).limit(1).collect()
    assert row and row[0]["ms"] > 1_500_000_000_000  # sane epoch-ms


def test_events_ts_watermark_analyzes(spark):
    """withWatermark rejects NTZ event-time columns
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE); assert the streaming path's
    normalization holds. Batch frames accept withWatermark (it is a no-op
    there), so this analyzes without starting a stream."""
    df = load_table(spark, SF_DIR, "events")
    wm = df.withWatermark("ts", "30 minutes")
    wm.select("ts").limit(1).collect()


def test_events_epoch_ms_matches_duckdb_oracle(spark):
    """Value-level pin: Spark's unix_millis over the normalized ts must
    equal DuckDB's epoch_ms reading the same parquet natively (nanos floor
    to ms in both). Guards against a normalization that analyzes but
    shifts the epoch (e.g. a non-UTC session TZ interacting with NTZ)."""
    import duckdb

    spark_ms = sorted(
        r["ms"]
        for r in load_table(spark, SF_DIR, "events")
        .orderBy("event_id")
        .select(F.unix_millis("ts").alias("ms"))
        .limit(50)
        .collect()
    )
    duck_ms = sorted(
        r[0]
        for r in duckdb.sql(
            f"SELECT epoch_ms(ts) FROM read_parquet('{SF_DIR}/events.parquet') "
            "ORDER BY event_id LIMIT 50"
        ).fetchall()
    )
    assert spark_ms == duck_ms
