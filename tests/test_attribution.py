"""Multi-touch linear attribution (operators/attribution.py): exact
milli-credit conservation and window/tie semantics vs a transparent
pure-Python reference."""

import random

from pyspark.sql import functions as F


def _run(spark, touches, convs, window_ms, credit=1000):
    from adtech_log_data_pipeline_spark.operators.attribution import (
        linear_attribution,
    )

    t = spark.createDataFrame(
        touches or [(None, None, None, None)],
        "touch_id long, user_id long, ts_ms long, channel string",
    ).filter(F.col("touch_id").isNotNull())
    c = spark.createDataFrame(
        convs or [(None, None, None)], "conv_id long, user_id long, conv_ms long"
    ).filter(F.col("conv_id").isNotNull())
    return linear_attribution(
        t, c, window_ms=window_ms, credit_milli=credit
    ).collect()


def _py_reference(touches, convs, window_ms, credit=1000):
    out = []
    for conv_id, cu, cms in convs:
        hits = sorted(
            (ts, tid, ch)
            for tid, tu, ts, ch in touches
            if tu == cu and cms - window_ms <= ts < cms
        )
        n = len(hits)
        for i, (ts, tid, ch) in enumerate(hits):
            out.append((conv_id, tid, ch, n, credit // n + (1 if i < credit % n else 0)))
    return sorted(out)


def test_fuzz_vs_python_reference_and_conservation(spark):
    rng = random.Random(88)
    touches = [
        (i, rng.randrange(6), rng.randrange(0, 500), rng.choice(["click", "view"]))
        for i in range(80)
    ]
    convs = [(100 + i, rng.randrange(6), rng.randrange(50, 550)) for i in range(25)]
    got = sorted(
        (r["conv_id"], r["touch_id"], r["channel"], r["n_touches"], r["credit"])
        for r in _run(spark, touches, convs, window_ms=100)
    )
    assert got == _py_reference(touches, convs, 100)
    # exact conservation: every attributed conversion sums to 1000
    per_conv = {}
    for conv_id, _tid, _ch, _n, credit in got:
        per_conv[conv_id] = per_conv.get(conv_id, 0) + credit
    assert per_conv and all(v == 1000 for v in per_conv.values())


def test_window_is_end_exclusive_and_user_scoped(spark):
    rows = _run(
        spark,
        [
            (1, 1, 100, "click"),  # exactly at conv instant -> excluded
            (2, 1, 99, "click"),  # inside
            (3, 1, 49, "click"),  # one before window start boundary -> out
            (4, 1, 50, "view"),  # exactly at window start -> included
            (5, 2, 99, "click"),  # other user -> out
        ],
        [(9, 1, 100)],
        window_ms=50,
    )
    assert sorted(r["touch_id"] for r in rows) == [2, 4]
    assert all(r["n_touches"] == 2 and r["credit"] == 500 for r in rows)


def test_remainder_goes_to_earliest_touches(spark):
    rows = _run(
        spark,
        [(i, 1, 10 + i, "click") for i in range(3)],
        [(9, 1, 100)],
        window_ms=1000,
    )
    by_id = {r["touch_id"]: r["credit"] for r in rows}
    assert by_id == {0: 334, 1: 333, 2: 333}
