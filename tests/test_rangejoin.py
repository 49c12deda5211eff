"""Banded range join laws (operators/rangejoin.py).

The rewrite's exactness claims — a point meets an interval in exactly one
band; an overlapping pair survives the canonical-band guard exactly once —
are checked against a transparent pure-Python brute force over adversarial
integer data (band-aligned boundaries, zero-length intervals, duplicates,
intervals spanning many bands) across several band widths.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from adtech_log_data_pipeline_spark.operators.rangejoin import (
    banded_overlap_join,
    banded_point_join,
)

# adversarial fixture: everything clustered around band multiples of the
# widths under test, plus zero-length and many-band-spanning intervals
random.seed(7)
POINTS = [(i, t) for i, t in enumerate(
    sorted(random.choices(range(0, 60), k=40))
)]
INTERVALS = (
    [(100 + i, s, s + w) for i, (s, w) in enumerate(
        (random.randrange(0, 60), random.choice([0, 1, 3, 7, 25])) for _ in range(30)
    )]
    + [(200, 0, 60), (201, 59, 59), (202, 12, 12), (203, 6, 18)]
)
WIDTHS = [1, 3, 7, 64]


def _points_df(spark):
    return spark.createDataFrame(POINTS, "pid int, t long")


def _ivals_df(spark, prefix):
    return spark.createDataFrame(
        INTERVALS, f"{prefix}id int, {prefix}s long, {prefix}e long"
    )


@pytest.mark.parametrize("width", WIDTHS)
def test_point_join_matches_brute_force(spark, width):
    expected = sorted(
        (p, i)
        for p, t in POINTS
        for i, s, e in INTERVALS
        if s <= t < e
    )
    got = (
        banded_point_join(
            _points_df(spark),
            _ivals_df(spark, "a"),
            point_ts="t",
            start_ts="as",
            end_ts="ae",
            band_width=width,
        )
        .select("pid", "aid")
        .collect()
    )
    assert sorted((r.pid, r.aid) for r in got) == expected  # incl. no dupes


def test_point_join_end_inclusive(spark):
    expected = sorted(
        (p, i) for p, t in POINTS for i, s, e in INTERVALS if s <= t <= e
    )
    got = (
        banded_point_join(
            _points_df(spark),
            _ivals_df(spark, "a"),
            point_ts="t",
            start_ts="as",
            end_ts="ae",
            band_width=5,
            end_exclusive=False,
        )
        .select("pid", "aid")
        .collect()
    )
    assert sorted((r.pid, r.aid) for r in got) == expected


@pytest.mark.parametrize("width", WIDTHS)
def test_overlap_join_matches_brute_force(spark, width):
    # half-open overlap; zero-length intervals overlap nothing
    expected = sorted(
        (a, b)
        for a, as_, ae in INTERVALS
        for b, bs, be in INTERVALS
        if as_ < be and bs < ae
    )
    got = (
        banded_overlap_join(
            _ivals_df(spark, "a"),
            _ivals_df(spark, "b"),
            left_start="as",
            left_end="ae",
            right_start="bs",
            right_end="be",
            band_width=width,
        )
        .select("aid", "bid")
        .collect()
    )
    assert sorted((r.aid, r.bid) for r in got) == expected  # incl. no dupes


def test_column_collision_rejected(spark):
    df = _ivals_df(spark, "a")
    with pytest.raises(ValueError, match="collision"):
        banded_point_join(
            df, df, point_ts="as", start_ts="as", end_ts="ae", band_width=5
        )


def test_point_join_on_timestamps(spark):
    """Timestamp columns band via epoch-second truncation — boundary
    micros must not leak a pair in or out vs long-ms banding."""
    pts = spark.createDataFrame(
        [(1, "2024-01-01 00:29:59.999999"), (2, "2024-01-01 00:30:00.000001")],
        "pid int, raw string",
    ).select("pid", F.col("raw").cast("timestamp").alias("t"))
    iv = spark.createDataFrame(
        [(9, "2024-01-01 00:00:00", "2024-01-01 00:30:00")],
        "iid int, s0 string, e0 string",
    ).select(
        "iid",
        F.col("s0").cast("timestamp").alias("s"),
        F.col("e0").cast("timestamp").alias("e"),
    )
    got = banded_point_join(
        pts, iv, point_ts="t", start_ts="s", end_ts="e", band_width=1800
    ).collect()
    assert [r.pid for r in got] == [1]


def test_click_attribution_plan_has_no_nested_loop(spark):
    """The whole point of the banded rewrite: the inequality join must NOT
    plan as BroadcastNestedLoopJoin / CartesianProduct."""
    import io
    from contextlib import redirect_stdout

    from adtech_log_data_pipeline_spark.plans.queries import QUERIES

    for name in ("click_attribution", "concurrent_sessions"):
        df = QUERIES[name](spark, "/root/testdata/sf0.001")
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("simple")
        plan = buf.getvalue()
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_nearest_click_banding_equals_bruteforce(spark):
    """The banded (user, band) equi-join formulation of the nearest-event
    as-of must equal the direct quadratic formulation on the sf0.001
    events — every purchase kept, nearest |lag| <= 30min, min-click-id
    tiebreak."""
    from pyspark.sql import functions as F

    from adtech_log_data_pipeline_spark.plans.northstar import q_nearest_click
    from adtech_log_data_pipeline_spark.sources.tables import load_table

    SF = "/root/testdata/sf0.001"
    got = {r["purchase_id"]: (r["click_id"], r["lag_ms"]) for r in
           q_nearest_click(spark, SF).collect()}
    ev = load_table(spark, SF, "events").filter(F.col("user_id").isNotNull())
    rows = ev.select("event_id", "user_id", "event_type",
                     F.unix_millis("ts").alias("ms")).collect()
    clicks = [(r["user_id"], r["event_id"], r["ms"]) for r in rows
              if r["event_type"] == "click"]
    expect = {}
    for r in rows:
        if r["event_type"] != "purchase":
            continue
        cands = [(abs(r["ms"] - ms), cid, r["ms"] - ms)
                 for u, cid, ms in clicks
                 if u == r["user_id"] and abs(r["ms"] - ms) <= 1_800_000]
        expect[r["event_id"]] = (
            (min(cands)[1], min(cands)[2]) if cands else (None, None)
        )
    assert got == expect
    assert any(v == (None, None) for v in got.values())  # null side exercised


def test_nearest_click_exact_boundary_inclusivity(spark, tmp_path):
    """|lag| == 30min exactly must MATCH (<= bound, both directions);
    30min + 1ms must not."""
    import os

    import pandas as pd

    from adtech_log_data_pipeline_spark.plans.northstar import q_nearest_click

    TOL = 1_800_000
    base = 1_700_000_000_000
    rows = [
        # user 1: click exactly TOL before the purchase -> matches
        (1, 1, "purchase", base), (2, 1, "click", base - TOL),
        # user 2: click exactly TOL after -> matches
        (3, 2, "purchase", base), (4, 2, "click", base + TOL),
        # user 3: click TOL+1ms away -> no match
        (5, 3, "purchase", base), (6, 3, "click", base + TOL + 1),
    ]
    pdf = pd.DataFrame(
        [
            {"event_id": i, "user_id": u, "event_type": t,
             "ts": pd.Timestamp(ms, unit="ms"), "value": 1.0, "props": "{}"}
            for i, u, t, ms in rows
        ]
    )
    d = str(tmp_path)
    pdf_df = spark.createDataFrame(pdf)
    pdf_df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {r["purchase_id"]: (r["click_id"], r["lag_ms"])
           for r in q_nearest_click(spark, d).collect()}
    assert got == {1: (2, TOL), 3: (4, -TOL), 5: (None, None)}
