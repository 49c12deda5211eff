"""Banded range join — big-big inequality joins without a nested loop.

Spark plans a join whose ONLY predicate is an inequality (point-in-range,
interval overlap) as BroadcastNestedLoopJoin or CartesianProduct — O(n*m)
compared pairs, a scale-killer when neither side is broadcastable. The
classic fix (used by Databricks' range-join optimization and by
interval-join implementations in Flink) is *banding*: quantize the range
dimension into fixed-width bands, expand each interval to every band it
touches, equi-join on the band key, then re-check the exact predicate as a
residual filter. The join becomes a shuffled hash/sort-merge join on an
integer key — linear in input size plus true match count.

Exactness notes (both proved in tests/test_rangejoin.py):

* point-in-interval: a point lives in exactly ONE band and an interval is
  expanded to every band it touches, so each true (point, interval) pair
  meets in exactly one band — no duplicates, no distinct needed.
* interval-overlap: two overlapping intervals share every band in the
  overlap region, so the pair is emitted once per shared band; the
  canonical-band guard (emit only where band == band(max(start1, start2)))
  keeps exactly one copy without a distinct.

Scale contract: shuffle is keyed on the band — pick `band_width` on the
order of the typical interval length. Width much smaller than the
intervals multiplies the explode factor (interval_len / width rows per
interval); width much larger packs many rows into few bands (skew). AQE
skew-join handles residual hot bands (a flash-crowd minute at 100 TB).

Reference parity: the reference engine has no range-join operator — this
is part of the beyond-reference analytics surface (SURVEY.md §2.4), built
because ad-tech attribution ("clicks within 30 minutes before a
purchase") is exactly a point-in-interval join on event time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BAND = "__band"


def _band(col: Column, band_width: int) -> Column:
    # floor division of epoch seconds; cast('long') on a timestamp yields
    # epoch seconds (truncation — monotone for the post-1970 data here, so
    # band(p) is always within [band(start), band(end)] when start<=p<=end)
    return F.floor(col.cast("long") / F.lit(band_width)).cast("long")


def banded_point_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    band_width: int,
    end_exclusive: bool = True,
) -> DataFrame:
    """Join each point row to every interval row with start <= point < end
    (or <= end when end_exclusive=False), as a band equi-join.

    Column names of `points` and `intervals` must be disjoint (alias
    before calling). Returns the joined rows with the band key dropped.
    """
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")
    p = points.withColumn(_BAND, _band(F.col(point_ts), band_width))
    i = intervals.withColumn(
        _BAND,
        F.explode(
            F.sequence(
                _band(F.col(start_ts), band_width),
                _band(F.col(end_ts), band_width),
            )
        ),
    )
    upper = (
        F.col(point_ts) < F.col(end_ts)
        if end_exclusive
        else F.col(point_ts) <= F.col(end_ts)
    )
    return (
        p.join(i, on=_BAND)
        .where((F.col(point_ts) >= F.col(start_ts)) & upper)
        .drop(_BAND)
    )


def banded_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    band_width: int,
) -> DataFrame:
    """Join interval pairs that overlap: l.start < r.end AND r.start < l.end
    (half-open [start, end) intervals), as a band equi-join.

    Duplicate elimination is the canonical-band rule: a true pair shares
    every band in its overlap region, and only the row where the join band
    equals band(greatest(l.start, r.start)) — the first overlapping band —
    is kept, so each pair survives exactly once with no distinct.
    """
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")
    l = left.withColumn(
        _BAND,
        F.explode(
            F.sequence(
                _band(F.col(left_start), band_width),
                _band(F.col(left_end), band_width),
            )
        ),
    )
    r = right.withColumn(
        _BAND,
        F.explode(
            F.sequence(
                _band(F.col(right_start), band_width),
                _band(F.col(right_end), band_width),
            )
        ),
    )
    canonical = F.col(_BAND) == _band(
        F.greatest(F.col(left_start), F.col(right_start)), band_width
    )
    return (
        l.join(r, on=_BAND)
        .where(
            (F.col(left_start) < F.col(right_end))
            & (F.col(right_start) < F.col(left_end))
            & canonical
        )
        .drop(_BAND)
    )
