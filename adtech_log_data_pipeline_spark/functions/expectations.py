"""Declarative data-quality expectations — the Deequ-style admission
gate a training-data pipeline runs on every ingest batch before the
data reaches curation (null/completeness, uniqueness, domain membership,
range and regex conformance), evaluated in ONE aggregation pass.

Each rule compiles to a conditional-count aggregate over the same scan;
the report unpivots the 1-row aggregate through a row generator (the
table_profile pattern — no second scan, no join). Metrics are fractions
from exact integer counts with one final IEEE divide, rounded to 1e-6 —
bit-reproducible against any engine.

Scale shape: a single map-side-combining hash aggregate with no keys
(one row of state per partition); `unique` is the only rule whose state
grows with cardinality (exact countDistinct) — at 100 TB swap it for
the KMV sketch estimate (functions/sketch.py) at a tolerance.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One declarative rule: ``kind`` in {not_null, unique, in_set,
    min_value, max_value, matches}. ``threshold`` is the minimum passing
    metric (a fraction in [0, 1]); metrics are defined so that 1.0 is
    always 'fully conformant'."""

    name: str
    column: str
    kind: str
    threshold: float = 1.0
    values: tuple | None = None  # in_set domain
    bound: float | None = None  # min_value / max_value bound
    pattern: str | None = None  # matches regex


def _metric(e: Expectation) -> Column:
    """Numerator/denominator counts for one rule — exact integers."""
    c = F.col(e.column)
    n = F.count(F.lit(1))
    if e.kind == "not_null":
        return F.struct(F.count(c).alias("num"), n.alias("den"))
    if e.kind == "unique":
        return F.struct(F.countDistinct(c).alias("num"), F.count(c).alias("den"))
    if e.kind == "in_set":
        ok = F.when(c.isin(*e.values), 1).otherwise(0)
    elif e.kind == "min_value":
        ok = F.when(c >= F.lit(e.bound), 1).otherwise(0)
    elif e.kind == "max_value":
        ok = F.when(c <= F.lit(e.bound), 1).otherwise(0)
    elif e.kind == "matches":
        ok = F.when(c.rlike(e.pattern), 1).otherwise(0)
    else:
        raise ValueError(f"unknown expectation kind: {e.kind}")
    # conformance over NON-NULL rows; nulls are not_null's business
    return F.struct(
        F.sum(F.when(c.isNull(), 0).otherwise(ok)).alias("num"),
        F.count(c).alias("den"),
    )


def run_expectations(df: DataFrame, rules: list[Expectation]) -> DataFrame:
    """Evaluate every rule in one scan. Output one flat row per rule:
    (rule, column, kind, metric_r6, threshold_r6, passed) where metric =
    num/den (1.0 on an empty denominator — a vacuous rule passes)."""
    one = df.agg(
        *[_metric(e).alias(f"__m_{i}") for i, e in enumerate(rules)]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(e.name).alias("rule"),
                F.lit(e.column).alias("column"),
                F.lit(e.kind).alias("kind"),
                F.round(
                    F.when(F.col(f"__m_{i}.den") == 0, F.lit(1.0)).otherwise(
                        F.col(f"__m_{i}.num")
                        / F.col(f"__m_{i}.den").cast("double")
                    ),
                    6,
                ).alias("metric_r6"),
                F.round(F.lit(float(e.threshold)), 6).alias("threshold_r6"),
                F.round(
                    F.when(F.col(f"__m_{i}.den") == 0, F.lit(1.0)).otherwise(
                        F.col(f"__m_{i}.num")
                        / F.col(f"__m_{i}.den").cast("double")
                    ),
                    6,
                ).alias("__m"),
            )
            for i, e in enumerate(rules)
        ]
    )
    return (
        one.select(F.explode(rows).alias("r"))
        .select(
            "r.rule",
            "r.column",
            "r.kind",
            "r.metric_r6",
            "r.threshold_r6",
            (F.col("r.__m") >= F.col("r.threshold_r6")).alias("passed"),
        )
    )


def _row_ok(e: Expectation) -> Column:
    """Row-level pass predicate for one rule. NULL values pass every
    conformance rule (they are not_null's business — same convention as
    the aggregate metrics); `unique` has no row-level form."""
    c = F.col(e.column)
    if e.kind == "not_null":
        return c.isNotNull()
    if e.kind == "in_set":
        return c.isNull() | c.isin(*e.values)
    if e.kind == "min_value":
        return c.isNull() | (c >= F.lit(e.bound))
    if e.kind == "max_value":
        return c.isNull() | (c <= F.lit(e.bound))
    if e.kind == "matches":
        return c.isNull() | c.rlike(e.pattern)
    raise ValueError(f"no row-level form for expectation kind: {e.kind}")


def enforce_expectations(
    df: DataFrame, rules: list[Expectation], id_cols: list[str]
) -> DataFrame:
    """Row-level quarantine: return the rows violating ANY row-level rule
    as (id_cols..., n_failed, failed_rules) with failed_rules a
    comma-joined, rule-order-stable name list. Map-only (pure column
    expressions over one scan — no shuffle, no UDF); the admission
    pipeline anti-joins this back or routes it to a quarantine sink.
    Table-level rules (`unique`) are skipped — they cannot indict a
    single row."""
    row_rules = [e for e in rules if e.kind != "unique"]
    tags = F.array(
        *[
            F.when(~_row_ok(e), F.lit(e.name)).otherwise(F.lit(None))
            for e in row_rules
        ]
    )
    return (
        df.select(*id_cols, tags.alias("__tags"))
        .select(
            *id_cols,
            F.expr("filter(__tags, x -> x is not null)").alias("__failed"),
        )
        .filter(F.size("__failed") > 0)
        .select(
            *id_cols,
            F.size("__failed").alias("n_failed"),
            F.array_join("__failed", ",").alias("failed_rules"),
        )
    )


# The declared documents-table rule set (plans/northstar.py restates it
# rule-by-rule in the oracle SQL).
DOCUMENT_RULES: list[Expectation] = [
    Expectation("doc_id_present", "doc_id", "not_null"),
    Expectation("doc_id_unique", "doc_id", "unique"),
    Expectation("text_present", "text", "not_null"),
    Expectation("text_nonblank", "text", "matches", pattern=r"\S", threshold=1.0),
    Expectation(
        "lang_known", "lang", "in_set",
        values=("en", "de", "fr", "es", "zh"), threshold=0.99,
    ),
    Expectation("n_chars_min", "n_chars", "min_value", bound=1.0),
    Expectation(
        "n_chars_max", "n_chars", "max_value", bound=100000.0, threshold=0.999,
    ),
    Expectation(
        "source_format", "source", "matches", pattern=r"^src[0-9]+$",
    ),
]

# Stricter row-level admission bar for the quarantine query — DOCUMENT_RULES
# is calibrated to PASS on the synthetic corpus; these deliberately indict
# a real subset so the quarantine path is exercised end-to-end.
QUARANTINE_RULES: list[Expectation] = [
    Expectation("doc_id_present", "doc_id", "not_null"),
    Expectation("text_present", "text", "not_null"),
    Expectation("min_chars_100", "n_chars", "min_value", bound=100.0),
    Expectation(
        "core_lang", "lang", "in_set", values=("en", "de", "fr"),
    ),
    Expectation("even_source", "source", "matches", pattern=r"^src[0-9]*[02468]$"),
]
