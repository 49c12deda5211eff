"""DuckDB oracle SQL — the independent re-statement of every declared
query's semantics in ANSI-ish SQL, run by the driver side-by-side with the
Spark DataFrame implementations (driver contract `__spark_entry__.oracle_sql`).

The bid-log queries share a CTE chain that re-derives the bid_logs view
(sources/bidlogs.py renders the SAME derivation for DuckDB) and then states
the reference semantics (SURVEY.md §2) in plain SQL — deliberately written
as direct GROUP BYs/joins, not a translation of the DataFrame code, so the
two sides are independent evidence.

Column aliases match plans/queries.py exactly (driver compares schemas and
sorts columns by name before hashing).
"""

from __future__ import annotations

from ..sources.bidlogs import bid_logs_cte, iapp_cte
from .audits import maintenance_oracles
from .relational import RELATIONAL_SQL
from .northstar import NORTHSTAR_ORACLES

# java.util.UUID.fromString's accept set (operators/validate.py::
# java_uuid_parseable — the reference's clause 9 is a bare try/catch, and
# Java's legacy parse accepts short/plus-signed groups): five '+?hex+'
# groups, four dashes, length <= 36, every group's value fits int64.
_UUID_STRUCT_RE = r"\+?[0-9a-fA-F]+(-\+?[0-9a-fA-F]+){4}"
_UUID_GROUP_RE = r"\+?0*([0-9a-fA-F]{1,15}|[0-7][0-9a-fA-F]{15})"

# Validity filter (reference BidLogUtils.isValid, 11 clauses) + canonical
# device identity, in DuckDB SQL.
_VALID = rf"""
valid_logs AS (
  SELECT bid_id, exchange, bid_result, bid_price, received_at, processed_at,
         upper(device_os) AS os, upper(device_ifa) AS uuid,
         app_bundle AS bundle, geo_country AS country, geo_region AS region
  FROM bid_logs
  WHERE exchange IN (1,2,3,4,5,6,7,8,9,10,21,22)
    AND bid_result IN (1,2,3,4)
    AND (CASE WHEN bid_result = 1 THEN bid_price > 0 ELSE bid_price = 0 END)
    AND received_at > 0
    AND processed_at > received_at
    AND lower(device_os) IN ('android','ios')
    AND length(device_ifa) <= 36
    AND regexp_full_match(device_ifa, '{_UUID_STRUCT_RE}')
    AND list_aggregate(list_transform(string_split(device_ifa, '-'),
          g -> regexp_full_match(g, '{_UUID_GROUP_RE}')), 'bool_and')
    AND regexp_matches(app_bundle, '\S')
    AND regexp_matches(geo_country, '\S')
    AND regexp_matches(geo_region, '\S')
)"""

# Profile aggregation levels (reference mergeDps/mergeApps laws).
_PROFILE_CTES = """
appex AS (
  SELECT os, uuid, bundle, exchange,
         CAST(count(*) AS INT) AS cnt,
         min(received_at) AS fa, max(received_at) AS la
  FROM valid_logs
  GROUP BY os, uuid, bundle, exchange
),
app AS (
  SELECT os, uuid, bundle,
         min(fa) AS app_first_at, max(la) AS app_last_at
  FROM appex GROUP BY os, uuid, bundle
),
dev AS (
  SELECT os, uuid, min(app_first_at) AS first_at, max(app_last_at) AS last_at
  FROM app GROUP BY os, uuid
)"""


def _with(*parts: str, select: str) -> str:
    return "WITH " + ",".join(parts) + "\n" + select


def _bidlog_base(*extra: str, select: str) -> str:
    return _with(bid_logs_cte("duckdb"), _VALID, _PROFILE_CTES, *extra, select=select)


_SUSPICIOUS_CTES = """
device_apps AS (SELECT DISTINCT os, uuid, bundle FROM valid_logs),
app_users AS (
  SELECT bundle, CAST(count(DISTINCT concat(os, '$', uuid)) AS INT) AS user_count
  FROM device_apps GROUP BY bundle
),
popular AS (SELECT bundle FROM app_users WHERE user_count > 40),
unpop AS (
  SELECT d.os, d.uuid, count(*) AS unpopular_apps
  FROM device_apps d LEFT JOIN popular p USING (bundle)
  WHERE p.bundle IS NULL
  GROUP BY d.os, d.uuid
),
dev_stats AS (
  SELECT os, uuid,
         count(DISTINCT concat(country, chr(31), region)) AS geo_cnt,
         count(*) AS total_bids
  FROM valid_logs GROUP BY os, uuid
),
suspicious AS (
  SELECT s.os, s.uuid
  FROM dev_stats s LEFT JOIN unpop u USING (os, uuid)
  WHERE s.geo_cnt > 30 OR coalesce(u.unpopular_apps, 0) > 3 OR s.total_bids > 47
)"""


def _oracle_bidlog_validation() -> str:
    return _with(
        bid_logs_cte("duckdb"),
        _VALID,
        select="""
        SELECT exchange,
               CAST(count(*) AS BIGINT) AS n_logs,
               CAST(sum(CASE WHEN bid_result = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bids,
               CAST(sum(bid_price) AS BIGINT) AS sum_price,
               min(received_at) AS min_received,
               max(received_at) AS max_received
        FROM valid_logs GROUP BY exchange
        """,
    )


def _oracle_device_profiles_flat() -> str:
    return _bidlog_base(
        select="""
        SELECT e.os, e.uuid, d.first_at, d.last_at, e.bundle,
               a.app_first_at, a.app_last_at, e.exchange, e.cnt
        FROM appex e
        JOIN app a USING (os, uuid, bundle)
        JOIN dev d USING (os, uuid)
        """
    )


def _oracle_device_profile_summary() -> str:
    return _bidlog_base(
        select="""
        SELECT d.os, d.uuid, d.first_at, d.last_at,
               CAST(s.app_count AS INT) AS app_count,
               CAST(s.geo_count AS INT) AS geo_count,
               CAST(s.total_bids AS BIGINT) AS total_bids
        FROM dev d
        JOIN (SELECT os, uuid,
                     count(DISTINCT bundle) AS app_count,
                     count(DISTINCT concat(country, chr(31), region)) AS geo_count,
                     count(*) AS total_bids
              FROM valid_logs GROUP BY os, uuid) s USING (os, uuid)
        """
    )


def _oracle_profile_cap_audit() -> str:
    from ..operators.device_profile import DEFAULT_PROFILE_APP_CAP as CAP

    return _bidlog_base(
        f"""
per_device AS (
  SELECT os, uuid, count(DISTINCT bundle) AS n_apps
  FROM valid_logs GROUP BY os, uuid
)""",
        select=f"""
        SELECT CAST({CAP} AS INT) AS cap,
               count(*) AS n_devices,
               CAST(max(n_apps) AS INT) AS max_apps,
               CAST(sum(CASE WHEN n_apps > {CAP} THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_devices_over_cap,
               CAST(sum(CASE WHEN n_apps > {CAP} THEN n_apps - {CAP} ELSE 0 END)
                 AS BIGINT) AS apps_dropped
        FROM per_device
        """,
    )


def _oracle_app_profiles_flat() -> str:
    return _bidlog_base(
        select="""
        SELECT bundle, -1 AS slot,
               CAST(count(DISTINCT concat(os, '$', uuid)) AS INT) AS cnt
        FROM appex GROUP BY bundle
        UNION ALL
        SELECT bundle, exchange AS slot,
               CAST(count(DISTINCT concat(os, '$', uuid)) AS INT) AS cnt
        FROM appex GROUP BY bundle, exchange
        """
    )


def _oracle_suspicious_ids() -> str:
    return _bidlog_base(_SUSPICIOUS_CTES, select="SELECT os, uuid FROM suspicious")


def _oracle_feature_inputs() -> str:
    return _bidlog_base(
        _SUSPICIOUS_CTES,
        iapp_cte("duckdb"),
        """
totals AS (
  SELECT CAST(count(*) AS BIGINT) AS iapp_size,
         CAST(coalesce(sum(num_purchasers), 0) AS BIGINT) AS total_purchasers,
         CAST(coalesce(sum(total_amount), 0) AS BIGINT) AS total_amount_sum
  FROM iapp
),
sampled AS (
  SELECT d.os, d.uuid, d.first_at,
         (SELECT CAST(count(*) AS INT) FROM app a
          WHERE a.os = d.os AND a.uuid = d.uuid) AS app_count
  FROM dev d
  LEFT JOIN suspicious s ON s.os = d.os AND s.uuid = d.uuid
  WHERE s.uuid IS NULL AND substr(d.uuid, 8, 1) = '0'
),
matched AS (
  SELECT a.os, a.uuid,
         CAST(count(*) AS BIGINT) AS intersect_app,
         CAST(sum(i.num_purchasers) AS BIGINT) AS intersect_purchaser,
         CAST(sum(i.total_amount) AS BIGINT) AS intersect_amount
  FROM app a JOIN iapp i USING (bundle)
  JOIN sampled sm ON sm.os = a.os AND sm.uuid = a.uuid
  GROUP BY a.os, a.uuid
)""",
        select="""
        SELECT sm.os, sm.uuid, sm.first_at, sm.app_count,
               coalesce(m.intersect_app, 0) AS intersect_app,
               coalesce(m.intersect_purchaser, 0) AS intersect_purchaser,
               coalesce(m.intersect_amount, 0) AS intersect_amount,
               coalesce(m.intersect_app, 0) / (1 + t.iapp_size) AS f486,
               coalesce(m.intersect_purchaser, 0) / (1 + t.total_purchasers) AS f586,
               coalesce(m.intersect_app, 0) / (1 + sm.app_count) AS f686,
               coalesce(m.intersect_amount, 0) / (1 + t.total_amount_sum) AS f777
        FROM sampled sm
        LEFT JOIN matched m ON m.os = sm.os AND m.uuid = sm.uuid
        CROSS JOIN totals t
        """,
    )


def _oracle_predictions() -> str:
    """Full restatement of the stand-in model (operators/inference.py) in
    DuckDB list SQL: base image pixels, mutated slots, the (784, 10)
    integer-formula weight matrix, and argmax-with-smallest-index-tie via
    list_position. Logits rounded to 1e-6 on both sides, so numpy's
    pairwise summation vs list_sum's sequential order cannot diverge."""
    x_expr = """
      CASE WHEN i = 486 THEN f486
           WHEN i = 586 THEN f586
           WHEN i = 686 THEN f686
           WHEN i = 777 THEN f777
           WHEN i >= 100 AND i <= 700 AND (i - 100) % 40 = 0
                THEN CAST(first_at % i AS DOUBLE) / i
           ELSE CAST(((k + 1) * (i + 1) * 2654435761) % 997 AS DOUBLE) / 997.0
      END"""
    return f"""
WITH fi AS ({_oracle_feature_inputs()}),
based AS (SELECT *, ord(substr(upper(uuid), 1, 1)) % 15 AS k FROM fi),
xv AS (
  SELECT os, uuid,
         list_transform(generate_series(0, 783), i -> {x_expr}) AS x
  FROM based
),
lg AS (
  SELECT os, uuid,
         list_transform(generate_series(0, 9), j ->
           round(list_sum(list_transform(generate_series(0, 783), i ->
             x[i + 1] * (CAST((i * 31 + j * 17) % 101 - 50 AS DOUBLE) / 50.0))), 6)) AS logits
  FROM xv
)
SELECT os, uuid,
       CAST(list_position(logits, list_max(logits)) - 1 AS INT) AS prediction,
       list_max(logits) AS score,
       'formula-v1' AS model_id
FROM lg
"""


ORACLES: dict[str, str] = {
    "bidlog_validation": _oracle_bidlog_validation(),
    "device_profiles_flat": _oracle_device_profiles_flat(),
    "device_profile_summary": _oracle_device_profile_summary(),
    "app_profiles_flat": _oracle_app_profiles_flat(),
    "suspicious_ids": _oracle_suspicious_ids(),
    "feature_inputs": _oracle_feature_inputs(),
    "predictions": _oracle_predictions(),
    "profile_cap_audit": _oracle_profile_cap_audit(),
    **{name: sql_fn("duckdb") for name, (sql_fn, _t) in RELATIONAL_SQL.items()},
    **NORTHSTAR_ORACLES,
    **maintenance_oracles(),
    # the TFRecord(gzip)-of-wire-protos ingestion gate: the Spark side
    # runs the parity chain from REAL TFRecord bytes; the oracle states
    # the identical aggregation over the parquet-derived bid_logs, so
    # hash-equality proves the codec path lossless (DuckDB never needs a
    # TFRecord reader).
    "tfrecord_parity_check": _oracle_device_profiles_flat(),
}
