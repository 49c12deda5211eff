"""Interval-stabbing sweep: concurrency curves over interval relations.

`interval_concurrency` answers "how many intervals are active at once" —
peak concurrent sessions per hour, simultaneous ad flights per day — the
classic sweep-line (+1 at start, -1 at end, running sum) made distributed.

Correctness subtlety (caught by the direct-counting law test in
tests/test_round6_ops.py): deltas are COLLAPSED to one net value per
distinct timestamp BEFORE the prefix scan. Per-delta prefixes visit
fictional intermediate states — two intervals ending at the same instant
pass through "entering - 1", a concurrency that never existed — and a
max over them can overstate the peak. After collapsing, every prefix
value is a real instantaneous concurrency C(t) = #{i: start_i <= t <
end_i} (intervals are half-open, so a start and an end at the same t
cancel inside the net — back-to-back intervals never look concurrent).

The running sum is NOT a single global window (a one-partition stage
that dies at 100 TB). It is the same textbook TWO-PHASE prefix scan as
functions/text.py::weighted_systematic_sample: phase 1 computes
bucket-local running sums with a window PARTITIONED by time bucket
(parallel across buckets); phase 2 prefix-sums the per-bucket net totals
— a bounded relation (one row per non-empty bucket), documented
single-partition window. Two keyed shuffles (net collapse re-uses the
bucket-keyed exchange) at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def interval_concurrency(
    intervals: DataFrame,
    *,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Per time bucket of width `bucket_width` (same integer unit as the
    half-open [start, end) interval bounds):

      n_start — concurrency AT the bucket-start instant, C(bucket_start)
      n_peak  — exact max of C(t) over the bucket
      n_end   — concurrency entering the next bucket, C(next_start - 1)

    Only buckets containing at least one interval boundary are emitted; a
    silent bucket's whole curve is the previous bucket's n_end (stated
    contract — emitting the dense grid is a gap-fill concern, cf.
    hourly_gapfill). Output: (bucket_start, n_start, n_peak, n_end), all
    bigint.
    """
    w = int(bucket_width)
    deltas = intervals.select(
        F.explode(
            F.array(
                F.struct(
                    F.col(start_col).cast("long").alias("t"),
                    F.lit(1).alias("delta"),
                ),
                F.struct(
                    F.col(end_col).cast("long").alias("t"),
                    F.lit(-1).alias("delta"),
                ),
            )
        ).alias("x")
    ).select("x.t", "x.delta", F.expr(f"x.t div {w}").alias("bucket"))
    # one net delta per distinct instant: every prefix value is now real
    net = deltas.groupBy("bucket", "t").agg(F.sum("delta").alias("net"))
    local = net.withColumn(
        "local_cum",
        F.sum("net").over(
            Window.partitionBy("bucket")
            .orderBy("t")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    per_bucket = local.groupBy("bucket").agg(
        F.max("local_cum").alias("max_cum"),
        F.sum("net").alias("bucket_total"),
        # net change happening exactly at the bucket-start instant (0 if
        # the first boundary falls later): n_start must include it —
        # the entering value no longer exists at t = bucket_start
        F.sum(
            F.when(F.col("t") == F.col("bucket") * w, F.col("net")).otherwise(
                F.lit(0)
            )
        ).alias("start_net"),
    )
    offsets = per_bucket.withColumn(
        "entering",
        F.coalesce(
            F.sum("bucket_total").over(
                Window.orderBy("bucket").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    )
    return offsets.select(
        (F.col("bucket") * F.lit(w)).cast("long").alias("bucket_start"),
        (F.col("entering") + F.col("start_net")).cast("long").alias("n_start"),
        F.greatest(
            F.col("entering") + F.col("start_net"),
            F.col("entering") + F.col("max_cum"),
        )
        .cast("long")
        .alias("n_peak"),
        (F.col("entering") + F.col("bucket_total")).cast("long").alias("n_end"),
    )
