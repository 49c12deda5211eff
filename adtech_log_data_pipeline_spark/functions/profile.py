"""Table profiling — the per-batch data-quality report an ingest pipeline
runs before admitting data (null fractions, exact cardinalities, value /
length bounds per column). The declared `table_profile` query instantiates
it over `documents`; the operator itself is schema-driven and runs on any
DataFrame.

Scale shape: ONE aggregation pass over the table produces every metric
(Spark expands multi-countDistinct via a single Expand + hash agg — the
rows scan once); the per-column unpivot is a row-generator over the 1-row
aggregate. At 100 TB swap the exact countDistinct for
approx_count_distinct (operators/approx.py shows the pattern) — exact
distinct counts are the one metric whose state grows with cardinality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DateType,
    MapType,
    NumericType,
    StringType,
    TimestampNTZType,
    TimestampType,
)


def table_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    approx_distinct: bool = False,
) -> DataFrame:
    """Per-column quality metrics:
    (col, n_rows, n_nulls, n_distinct, min_val, max_val), all bigint.
    Bounds by type: numeric/boolean -> value; string -> LENGTH (length
    bounds are collation-free, so the report is engine-portable); date ->
    epoch days; timestamp -> epoch millis. Any other type (array, struct,
    binary, map) still gets null/cardinality metrics with NULL bounds
    (maps are not comparable in Spark, so their n_distinct is NULL
    too) — no column type fails the profile.

    ``approx_distinct=True`` swaps the exact countDistinct (whose agg
    state grows with cardinality) for HyperLogL++ — the 100 TB posture;
    approx results are engine-specific, so the oracle-gated query keeps
    the exact default (same tradeoff as operators/approx.py)."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = columns if columns is not None else list(fields)
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        t = fields[c]
        distinct: Column = (
            F.approx_count_distinct(c) if approx_distinct else F.countDistinct(c)
        )
        if isinstance(t, NumericType):
            lo, hi = F.min(c), F.max(c)
        elif isinstance(t, StringType):
            lo, hi = F.min(F.length(c)), F.max(F.length(c))
        elif isinstance(t, BooleanType):
            v = F.col(c).cast("bigint")
            lo, hi = F.min(v), F.max(v)
        elif isinstance(t, DateType):
            v = F.datediff(F.col(c), F.lit("1970-01-01"))
            lo, hi = F.min(v), F.max(v)
        elif isinstance(t, TimestampType):
            # zoned timestamp: an absolute instant — unix_millis is
            # already engine/host-portable
            v = F.unix_millis(F.col(c))
            lo, hi = F.min(v), F.max(v)
        elif isinstance(t, TimestampNTZType):
            # NTZ: NEVER route through cast('timestamp') (that reads
            # spark.sql.session.timeZone — the vanilla driver session has
            # no timezone pin). Epoch millis from the LOCAL datetime
            # fields: to_date/hour/minute/extract(second) on NTZ read the
            # stored fields directly, timezone-free. extract(second)
            # carries the fractional part (decimal), so floor(sec*1000)
            # is the full millis-within-minute.
            v = (
                F.datediff(F.to_date(F.col(c)), F.lit("1970-01-01")).cast("bigint")
                * 86400000
                + F.hour(F.col(c)).cast("bigint") * 3600000
                + F.minute(F.col(c)).cast("bigint") * 60000
                + F.floor(
                    F.expr(f"extract(second from `{c}`)").cast("decimal(18,6)")
                    * 1000
                ).cast("bigint")
            )
            lo, hi = F.min(v), F.max(v)
        else:
            lo, hi = F.lit(None), F.lit(None)
            if isinstance(t, MapType):
                distinct = F.lit(None).cast("bigint")
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            distinct.alias(f"__nd_{c}"),
            lo.cast("bigint").alias(f"__lo_{c}"),
            hi.cast("bigint").alias(f"__hi_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col("__n_rows").alias("n_rows"),
                (F.col("__n_rows") - F.col(f"__nn_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__lo_{c}").alias("min_val"),
                F.col(f"__hi_{c}").alias("max_val"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("m")).select("m.*")
