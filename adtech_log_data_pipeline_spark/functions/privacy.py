"""Privacy QA for training-data release: k-anonymity / l-diversity audit.

Engine-added capability (no reference counterpart — the reference ships
device IDs straight into profiles, see `D/transforms/DeviceProfiles.java`;
a pipeline that EXPORTS training data needs the opposite: proof that the
quasi-identifier combination does not single out individuals). The audit
follows the classic k-anonymity / l-diversity definitions (Sweeney 2002;
Machanavajjhala et al. 2007): rows are grouped into equivalence classes by
their quasi-identifiers, k-anonymity is the smallest class size, and
l-diversity is the smallest number of distinct sensitive values within a
class.

The audit evaluates a LADDER of generalization widths for the numeric
quasi-identifier (account balance bucketed at increasing coarseness), so
one query answers the planner question "how much must I generalize before
every class has >= k members?".

Exactness / portability conventions (shared with the rest of the board):

* money is bigint CENTS (``round(x*100)``) — no float grouping keys;
* cents are OFFSET to non-negative before the bucket division so Spark's
  truncating ``div`` and DuckDB's ``//`` agree (acctbal can be negative,
  and the two engines round integer division differently below zero);
* ratios are integer ppm via bigint division — bit-stable across engines.

Scale shape: one explode over the (tiny, constant) width ladder, then a
two-level hash aggregation — classes << rows, widths are a literal array,
and nothing ever leaves the executors. At 100 TB this is exactly the
groupBy-cube shape Spark does well; no window, no collect, no skew risk
beyond what the QI distribution itself carries (a hot class is *the
answer*, not a performance bug).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: generalization ladder for the acctbal quasi-identifier, in WHOLE DOLLARS
DEFAULT_WIDTHS = (100, 500, 2000)

#: classes smaller than this are "at risk" (the k in k-anonymity)
DEFAULT_K = 5

#: shift applied to cents so every bucketed value is non-negative
#: (synthetic acctbal floor is -999.99; TPC-H's real floor is -999.99 too)
CENTS_OFFSET = 100_000


def k_anonymity_audit(
    customer: DataFrame,
    widths: tuple[int, ...] = DEFAULT_WIDTHS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Per generalization width: equivalence-class census of the
    quasi-identifiers (nation, bucketed acctbal) with c_mktsegment as the
    sensitive attribute.

    Output: (width, n_classes, k_anonymity, l_diversity, rows_at_risk,
    risk_ppm) — one row per ladder width; ``k_anonymity`` is min class
    size, ``l_diversity`` min distinct sensitive values per class,
    ``rows_at_risk`` the population of classes below ``k``.
    """
    widths_arr = F.array(*[F.lit(int(w)) for w in widths])
    base = customer.select(
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        (
            F.round(F.col("c_acctbal") * 100).cast("bigint")
            + F.lit(CENTS_OFFSET)
        ).alias("cents"),
        F.explode(widths_arr).alias("width"),
    )
    classes = (
        base.withColumn(
            "bucket", F.expr("cents div (width * 100)")
        )
        .groupBy("width", "nat", "bucket")
        .agg(
            F.count(F.lit(1)).alias("sz"),
            F.countDistinct("seg").alias("segs"),
        )
    )
    return (
        classes.groupBy("width")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.min("sz").alias("k_anonymity"),
            F.min("segs").alias("l_diversity"),
            F.sum(F.when(F.col("sz") < k, F.col("sz")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("rows_at_risk"),
            F.sum("sz").cast("bigint").alias("total_rows"),
        )
        .select(
            "width",
            "n_classes",
            "k_anonymity",
            "l_diversity",
            "rows_at_risk",
            F.expr("(rows_at_risk * 1000000) div total_rows").alias(
                "risk_ppm"
            ),
        )
    )
