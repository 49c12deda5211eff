"""2D skyline (Pareto frontier) — the maximize-both dominance filter.

A row p is DOMINATED iff some row q has q.x >= p.x AND q.y >= p.y with
at least one strict inequality; the skyline is the non-dominated set
(exact duplicates all survive — nothing strictly beats them).

Formulation: the textbook check is a quadratic NOT EXISTS self-join
(what the DuckDB oracle states). Here instead:

  1. gmax(x)   = max y within each x group          (one x-keyed hash agg)
  2. runmax(x) = max gmax over all STRICTLY greater x (one window over the
                 DISTINCT-x level — group-count rows, not input rows)
  3. p survives iff p.y == gmax(p.x) AND gmax(p.x) > runmax(p.x)

Step 3 is exactly dominance: a same-x row with higher y dominates
(y strict), and any >=-y row at greater x dominates (x strict) — so
surviving requires topping your own x group AND strictly beating every
greater-x group's best. O(n log n) with no cross product; the only
unpartitioned window runs on the distinct-x level, bounded by the value
domain, never the row count (the skew_report TakeOrdered convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def skyline_2d(df: DataFrame, x: str, y: str) -> DataFrame:
    """Rows of `df` on the maximize-(x, y) Pareto frontier, original
    columns preserved. x and y must be orderable and null-free."""
    gmax = df.groupBy(x).agg(F.max(y).alias("__gmax"))
    w = Window.orderBy(F.col(x).desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    levels = gmax.withColumn("__runmax", F.max("__gmax").over(w))
    return (
        df.join(levels, x)
        .filter(
            (F.col(y) == F.col("__gmax"))
            & (
                F.col("__runmax").isNull()
                | (F.col("__gmax") > F.col("__runmax"))
            )
        )
        .select(*df.columns)
    )
