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


def _attributed_pairs(touches: DataFrame, conversions: DataFrame, window_ms: int) -> DataFrame:
    """The shared (touch x conversion) pairing: same user, touch strictly
    before the conversion instant, at most ``window_ms`` old. One
    user-keyed equi-join + map-side window filter (see module docstring
    for the scale shape)."""
    t = touches.select("touch_id", "user_id", "ts_ms", "channel")
    c = conversions.select("conv_id", "user_id", "conv_ms")
    return t.join(c, "user_id").filter(
        (F.col("ts_ms") >= F.col("conv_ms") - F.lit(int(window_ms)))
        & (F.col("ts_ms") < F.col("conv_ms"))
    )


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
    j = _attributed_pairs(touches, conversions, window_ms)
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


def time_decay_attribution(
    touches: DataFrame,
    conversions: DataFrame,
    *,
    window_ms: int,
    half_life_ms: int,
    credit_milli: int = 1000,
) -> DataFrame:
    """Exponential time-decay credit in exact integer milli-credits.

    The lookback window splits into B = window_ms / half_life_ms equal
    age buckets (window_ms must divide evenly); a touch of age
    ``conv_ms - ts_ms`` (in (0, window_ms]) lands in bucket
    ``(age - 1) div half_life_ms`` and carries integer weight
    ``2^(B - 1 - bucket)`` — each half-life of age halves the weight,
    most-recent bucket weighs 2^(B-1). Credit is the weight-proportional
    largest-remainder split of ``credit_milli``: floor shares
    ``credit * w div W`` first, then the leftover units go +1 each to the
    touches with the largest remainder (ties broken most-recent-first,
    then touch_id) — so per-conversion conservation is unit-exact, the
    same discipline as linear_attribution, and deterministic under any
    shuffle order. Same join/window scale shape as linear_attribution.

    Output: (conv_id, touch_id, channel, n_touches, weight, credit)."""
    window_ms, half_life_ms = int(window_ms), int(half_life_ms)
    if half_life_ms <= 0 or window_ms % half_life_ms:
        raise ValueError(
            f"window_ms={window_ms} must be a positive multiple of"
            f" half_life_ms={half_life_ms}"
        )
    n_buckets = window_ms // half_life_ms
    m = int(credit_milli)
    j = _attributed_pairs(touches, conversions, window_ms)
    w_conv = Window.partitionBy("conv_id")
    w_rk = Window.partitionBy("conv_id").orderBy(
        F.col("rem").desc(), F.col("ts_ms").desc(), F.col("touch_id")
    )
    weighted = j.withColumn(
        "weight",
        F.expr(
            "shiftleft(cast(1 as bigint),"
            f" cast({n_buckets - 1} - (conv_ms - 1 - ts_ms) div {half_life_ms}"
            " as int))"
        ),
    )
    shared = (
        weighted.withColumn("n_touches", F.count(F.lit(1)).over(w_conv))
        .withColumn("w_total", F.sum("weight").over(w_conv))
        .withColumn("share", F.expr(f"({m} * weight) div w_total"))
        .withColumn("rem", F.expr(f"({m} * weight) % w_total"))
        .withColumn("leftover", F.lit(m) - F.sum("share").over(w_conv))
    )
    return shared.withColumn("rk", F.row_number().over(w_rk)).select(
        "conv_id",
        "touch_id",
        "channel",
        F.col("n_touches").cast("long").alias("n_touches"),
        F.col("weight").cast("long").alias("weight"),
        F.expr(
            "cast(share + (case when rk <= leftover then 1 else 0 end) as bigint)"
        ).alias("credit"),
    )


def position_attribution(
    touches: DataFrame,
    conversions: DataFrame,
    *,
    window_ms: int,
    credit_milli: int = 1000,
    endpoint_pct: int = 40,
) -> DataFrame:
    """U-shaped (position-based) credit in exact integer milli-credits:
    first and last touch each take ``endpoint_pct``% of the credit, the
    middle touches split the remainder evenly (largest-remainder, earliest
    first). Degenerate conversions: one touch takes everything; two
    touches split evenly (odd unit to the first). Per-conversion
    conservation is unit-exact for every n (law: tests/test_attribution.py).
    Same join/window scale shape as linear_attribution.

    Output: (conv_id, touch_id, channel, n_touches, credit)."""
    m = int(credit_milli)
    endpoint = m * int(endpoint_pct) // 100
    middle_pool = m - 2 * endpoint
    j = _attributed_pairs(touches, conversions, window_ms)
    w_n = Window.partitionBy("conv_id")
    w_rk = Window.partitionBy("conv_id").orderBy("ts_ms", "touch_id")
    return (
        j.withColumn("n_touches", F.count(F.lit(1)).over(w_n))
        .withColumn("rk", F.row_number().over(w_rk))
        .select(
            "conv_id",
            "touch_id",
            "channel",
            F.col("n_touches").cast("long").alias("n_touches"),
            F.expr(
                f"""cast(case
                  when n_touches = 1 then {m}
                  when n_touches = 2 then {m} div 2
                       + (case when rk = 1 then {m} % 2 else 0 end)
                  when rk = 1 or rk = n_touches then {endpoint}
                  else {middle_pool} div (n_touches - 2)
                       + (case when rk - 1 <= {middle_pool} % (n_touches - 2)
                          then 1 else 0 end)
                end as bigint)"""
            ).alias("credit"),
        )
    )
