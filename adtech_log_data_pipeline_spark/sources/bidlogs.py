"""Deterministic bid-log view derived from the synthetic ``events`` table.

The reference pipeline's fact input is a stream of ``BidLog`` protos
(reference: java/dataflow/src/proto/bid.proto:12-64; the 6 OpenRTB leaves
actually read are listed in SURVEY.md §1.2). The driver's testdata has no
bid-log table, so the engine derives one — deterministically, in pure SQL —
from ``events`` (FIXTURES.md §7 role mapping). The SAME derivation renders
in two dialects (Spark SQL / DuckDB) so the driver's oracle sees a
bit-identical input table; only engine-specific function names differ
(``unix_millis``/``epoch_ms``, ``conv``/hex-cast).

The derivation purposefully reproduces every data-quality wrinkle the
reference's validation layer exists for (FIXTURES.md §1):
  * mixed-case os strings + ~1% invalid os
  * one canonical UUID per user_id, upper/lower-cased per row, ~1% malformed
  * case-sensitive bundles with occasional upper-cased duplicates and blanks
  * exchange 0 (UNKNOWN) and bid_result 0 rows (invalid)
  * bid_price ⇔ bid_result consistency violations
  * processed_at ≤ received_at violations
  * blank geo fields

Schema of the resulting ``bid_logs`` relation:
  bid_id string, exchange int, bid_result int, bid_price int,
  received_at bigint (epoch ms), processed_at bigint,
  device_os string, device_ifa string, app_bundle string,
  geo_country string, geo_region string
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _ms(expr: str, dialect: str) -> str:
    """Epoch-milliseconds of a timestamp column (both engines read the
    parquet timestamps as UTC instants; session TZ pinned to UTC)."""
    return f"unix_millis({expr})" if dialect == "spark" else f"epoch_ms({expr})"


def _h2i(expr: str, dialect: str) -> str:
    """Hex string -> bigint. Spark: conv(x,16,10) (string) cast to bigint;
    DuckDB: '0x'-prefixed cast. Inputs are <= 8 hex chars so no overflow."""
    if dialect == "spark":
        return f"cast(conv({expr}, 16, 10) as bigint)"
    return f"('0x' || {expr})::BIGINT"


def bid_logs_cte(dialect: str, events_rel: str = "events") -> str:
    """CTE body deriving ``bid_logs`` from ``events``. Prepend as
    ``WITH {bid_logs_cte(d)} SELECT ...``. Pure deterministic SQL —
    identical row set in both dialects."""
    assert dialect in ("spark", "duckdb")
    ms = lambda e: _ms(e, dialect)
    h2i = lambda e: _h2i(e, dialect)
    return f"""
_ev AS (
  SELECT
    event_id,
    user_id,
    event_type,
    value,
    {ms('ts')} AS ts_ms,
    md5(CAST(user_id AS STRING)) AS uh,
    md5(CAST(event_id AS STRING)) AS eh
  FROM {events_rel}
),
_base AS (
  SELECT
    *,
    concat(substr(uh, 1, 8), '-', substr(uh, 9, 4), '-', substr(uh, 13, 4),
           '-', substr(uh, 17, 4), '-', substr(uh, 21, 12)) AS uuid_canon,
    concat(event_type, '.app', CAST({h2i('substr(eh, 1, 4)')} % 7 AS STRING)) AS bundle_base
  FROM _ev
),
bid_logs AS (
  SELECT
    CAST(event_id AS STRING) AS bid_id,
    CAST(CASE WHEN event_id % 19 = 0 THEN 0
              WHEN event_id % 17 = 0 THEN 21
              WHEN event_id % 13 = 0 THEN 22
              ELSE 1 + (event_id % 10) END AS INT) AS exchange,
    CAST(event_id % 5 AS INT) AS bid_result,
    CAST(CASE WHEN event_id % 89 = 0 THEN (CASE WHEN event_id % 5 = 1 THEN 0 ELSE 7 END)
              WHEN event_id % 5 = 1 THEN 1 + (abs(CAST(floor(value * 100) AS BIGINT)) % 9999)
              ELSE 0 END AS INT) AS bid_price,
    ts_ms AS received_at,
    CASE WHEN event_id % 83 = 0 THEN ts_ms - 5
         ELSE ts_ms + 1 + (event_id % 5000) END AS processed_at,
    CASE WHEN user_id % 101 = 0 THEN 'windows'
         WHEN user_id % 7 = 0 THEN (CASE WHEN event_id % 2 = 0 THEN 'ios' ELSE 'iOS' END)
         ELSE (CASE WHEN event_id % 3 = 0 THEN 'android'
                    WHEN event_id % 3 = 1 THEN 'Android'
                    ELSE 'ANDROID' END) END AS device_os,
    CASE WHEN event_id % 97 = 0 THEN 'not-a-uuid'
         WHEN event_id % 2 = 0 THEN upper(uuid_canon)
         ELSE uuid_canon END AS device_ifa,
    CASE WHEN event_id % 103 = 0 THEN ' '
         WHEN event_id % 53 = 0 THEN upper(bundle_base)
         ELSE bundle_base END AS app_bundle,
    CASE WHEN event_id % 107 = 0 THEN ''
         ELSE (CASE CAST((user_id + event_id % 11) % 6 AS INT)
                 WHEN 0 THEN 'USA' WHEN 1 THEN 'usa' WHEN 2 THEN 'CAN'
                 WHEN 3 THEN 'GBR' WHEN 4 THEN 'IND' ELSE 'BRA' END) END AS geo_country,
    CASE WHEN event_id % 109 = 0 THEN ' '
         ELSE concat('r', CAST((user_id + event_id % 7) % 29 AS STRING)) END AS geo_region
  FROM _base
)"""


def iapp_cte(dialect: str) -> str:
    """In-app-purchase-profile dimension (reference:
    java/dataflow/src/proto/profile.proto:27-38 — bundle, num_purchasers,
    total_amount). Derived from the distinct bundle domain of bid_logs so
    roughly two-thirds of observed bundles have purchase data (FIXTURES.md §3
    asks for partial overlap to drive the intersect features). Requires
    ``bid_logs`` to be in scope (append after bid_logs_cte)."""
    h2i = lambda e: _h2i(e, dialect)
    return f"""
iapp AS (
  SELECT
    bundle,
    CAST(1 + ({h2i('substr(md5(bundle), 1, 6)')} % 25) AS BIGINT) AS num_purchasers,
    CAST(17 + ({h2i('substr(md5(bundle), 9, 6)')} % 100) * 10 AS BIGINT) AS total_amount
  FROM (SELECT DISTINCT app_bundle AS bundle FROM bid_logs
        WHERE app_bundle IS NOT NULL AND trim(app_bundle) <> '') d
  WHERE {h2i('substr(md5(bundle), 27, 2)')} % 3 < 2
)"""


def _events_view(spark: SparkSession, sf_dir: str) -> None:
    from .tables import load_table

    events = load_table(spark, sf_dir, "events")
    # the synthetic events parquet is a single file/partition: spread it so
    # the per-row derivation (md5s, regex validation, CASE towers) runs
    # parallel instead of on one core (real deployments get this for free
    # from the file layout)
    events = events.repartition(spark.sparkContext.defaultParallelism)
    events.createOrReplaceTempView("events")


def load_bid_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the bid_logs view for a scale-factor directory."""
    _events_view(spark, sf_dir)
    return spark.sql(f"WITH {bid_logs_cte('spark')} SELECT * FROM bid_logs")


def load_iapp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the iapp dimension for a scale-factor directory."""
    _events_view(spark, sf_dir)
    return spark.sql(
        f"WITH {bid_logs_cte('spark')}, {iapp_cte('spark')} SELECT * FROM iapp"
    )
