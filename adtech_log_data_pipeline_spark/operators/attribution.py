"""Multi-touch attribution — linear credit split over a user's
touchpoints inside a conversion lookback window, in EXACT integer
milli-credits (largest-remainder, the penny_allocation discipline): each
conversion distributes precisely ``credit_milli`` across its touches, so
channel totals reconcile to n_conversions x credit_milli to the unit —
the invariant ad-finance reporting audits against (reference domain:
the bid-log pipeline's downstream spend attribution; engine-added
capability per SURVEY §2.6 — the reference stops at profile building).

Scale shape: ONE user-keyed equi-join (touches x conversions both
shuffle on user_id — co-located if the tables are user-bucketed), the
window filter applied map-side after the join, then two window
functions partitioned by CONVERSION id (groups = touches-per-conversion,
bounded by the lookback window — never corpus-sized). A hyperactive-user
hot key fans out touches x conversions within the window only; the
window bound caps the blowup, and the conversion-keyed window state
never exceeds one lookback's touches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def linear_attribution(
    touches: DataFrame,
    conversions: DataFrame,
    *,
    window_ms: int,
    credit_milli: int = 1000,
) -> DataFrame:
    """Per-(conversion, touch) linear credit. ``touches`` carries
    (touch_id, user_id, ts_ms, channel); ``conversions`` carries
    (conv_id, user_id, conv_ms). A touch attributes to a conversion of
    the SAME user when conv_ms - window_ms <= ts_ms < conv_ms (end
    exclusive: the conversion instant itself is not a touch).

    Credit: with n touches, each gets credit_milli div n; the first
    (credit_milli mod n) touches by (ts_ms, touch_id) ascending get +1 —
    exact conservation per conversion (law: tests/test_attribution.py),
    deterministic under any shuffle order.

    Output: (conv_id, touch_id, channel, n_touches, credit)."""
    t = touches.select("touch_id", "user_id", "ts_ms", "channel")
    c = conversions.select("conv_id", "user_id", "conv_ms")
    j = t.join(c, "user_id").filter(
        (F.col("ts_ms") >= F.col("conv_ms") - F.lit(int(window_ms)))
        & (F.col("ts_ms") < F.col("conv_ms"))
    )
    w_n = Window.partitionBy("conv_id")
    w_rk = Window.partitionBy("conv_id").orderBy("ts_ms", "touch_id")
    m = int(credit_milli)
    return (
        j.withColumn("n_touches", F.count(F.lit(1)).over(w_n))
        .withColumn("rk", F.row_number().over(w_rk))
        .select(
            "conv_id",
            "touch_id",
            "channel",
            F.col("n_touches").cast("long").alias("n_touches"),
            F.expr(
                f"cast({m} div n_touches"
                f" + (case when rk <= {m} % n_touches then 1 else 0 end)"
                " as bigint)"
            ).alias("credit"),
        )
    )
