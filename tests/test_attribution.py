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


# --- time-decay attribution -------------------------------------------------


def _mk_frames(spark, touches, convs):
    t = spark.createDataFrame(
        touches or [(None, None, None, None)],
        "touch_id long, user_id long, ts_ms long, channel string",
    ).filter(F.col("touch_id").isNotNull())
    c = spark.createDataFrame(
        convs or [(None, None, None)], "conv_id long, user_id long, conv_ms long"
    ).filter(F.col("conv_id").isNotNull())
    return t, c


def _py_time_decay(touches, convs, window_ms, half_life_ms, credit=1000):
    n_buckets = window_ms // half_life_ms
    out = []
    for conv_id, cu, cms in convs:
        hits = [
            (ts, tid, ch)
            for tid, tu, ts, ch in touches
            if tu == cu and cms - window_ms <= ts < cms
        ]
        if not hits:
            continue
        weights = {
            tid: 1 << (n_buckets - 1 - (cms - 1 - ts) // half_life_ms)
            for ts, tid, _ch in hits
        }
        w_total = sum(weights.values())
        shares = {tid: credit * w // w_total for tid, w in weights.items()}
        leftover = credit - sum(shares.values())
        # largest remainder, most-recent-first ties, then touch_id
        order = sorted(
            hits,
            key=lambda h: (-(credit * weights[h[1]] % w_total), -h[0], h[1]),
        )
        for i, (_ts, tid, _ch) in enumerate(order):
            if i < leftover:
                shares[tid] += 1
        for ts, tid, ch in hits:
            out.append((conv_id, tid, ch, len(hits), weights[tid], shares[tid]))
    return sorted(out)


def test_time_decay_fuzz_vs_python_reference_and_conservation(spark):
    from adtech_log_data_pipeline_spark.operators.attribution import (
        time_decay_attribution,
    )

    rng = random.Random(99)
    touches = [
        (i, rng.randrange(6), rng.randrange(0, 500), rng.choice(["click", "view"]))
        for i in range(80)
    ]
    convs = [(100 + i, rng.randrange(6), rng.randrange(60, 550)) for i in range(25)]
    t, c = _mk_frames(spark, touches, convs)
    rows = time_decay_attribution(t, c, window_ms=120, half_life_ms=40).collect()
    got = sorted(
        (r["conv_id"], r["touch_id"], r["channel"], r["n_touches"], r["weight"], r["credit"])
        for r in rows
    )
    assert got == _py_time_decay(touches, convs, 120, 40)
    per_conv = {}
    for conv_id, *_rest, credit in got:
        per_conv[conv_id] = per_conv.get(conv_id, 0) + credit
    assert per_conv and all(v == 1000 for v in per_conv.values())


def test_time_decay_weights_halve_per_half_life(spark):
    from adtech_log_data_pipeline_spark.operators.attribution import (
        time_decay_attribution,
    )

    # ages 1, 41, 81 with half_life 40 -> buckets 0,1,2 -> weights 4,2,1
    t, c = _mk_frames(
        spark,
        [(1, 1, 99, "a"), (2, 1, 59, "b"), (3, 1, 19, "c")],
        [(9, 1, 100)],
    )
    rows = time_decay_attribution(t, c, window_ms=120, half_life_ms=40).collect()
    by_id = {r["touch_id"]: (r["weight"], r["credit"]) for r in rows}
    # W=7: floor shares 571/285/142 (sum 998); remainders 3/5/6 -> +1 to ids 3,2
    assert by_id == {1: (4, 571), 2: (2, 286), 3: (1, 143)}


def test_time_decay_rejects_non_dividing_half_life(spark):
    import pytest

    from adtech_log_data_pipeline_spark.operators.attribution import (
        time_decay_attribution,
    )

    t, c = _mk_frames(spark, [(1, 1, 1, "a")], [(2, 1, 5)])
    with pytest.raises(ValueError):
        time_decay_attribution(t, c, window_ms=100, half_life_ms=33)


# --- U-shaped (position) attribution ----------------------------------------


def _py_position(touches, convs, window_ms, credit=1000, endpoint_pct=40):
    endpoint = credit * endpoint_pct // 100
    pool = credit - 2 * endpoint
    out = []
    for conv_id, cu, cms in convs:
        hits = sorted(
            (ts, tid, ch)
            for tid, tu, ts, ch in touches
            if tu == cu and cms - window_ms <= ts < cms
        )
        n = len(hits)
        for i, (ts, tid, ch) in enumerate(hits):
            rk = i + 1
            if n == 1:
                cr = credit
            elif n == 2:
                cr = credit // 2 + (credit % 2 if rk == 1 else 0)
            elif rk in (1, n):
                cr = endpoint
            else:
                cr = pool // (n - 2) + (1 if rk - 1 <= pool % (n - 2) else 0)
            out.append((conv_id, tid, ch, n, cr))
    return sorted(out)


def test_position_fuzz_vs_python_reference_and_conservation(spark):
    from adtech_log_data_pipeline_spark.operators.attribution import (
        position_attribution,
    )

    rng = random.Random(77)
    touches = [
        (i, rng.randrange(6), rng.randrange(0, 500), rng.choice(["click", "view"]))
        for i in range(90)
    ]
    convs = [(100 + i, rng.randrange(6), rng.randrange(50, 550)) for i in range(25)]
    t, c = _mk_frames(spark, touches, convs)
    rows = position_attribution(t, c, window_ms=100).collect()
    got = sorted(
        (r["conv_id"], r["touch_id"], r["channel"], r["n_touches"], r["credit"])
        for r in rows
    )
    assert got == _py_position(touches, convs, 100)
    per_conv = {}
    for conv_id, _tid, _ch, _n, credit in got:
        per_conv[conv_id] = per_conv.get(conv_id, 0) + credit
    assert per_conv and all(v == 1000 for v in per_conv.values())


def test_position_shapes_for_small_n(spark):
    from adtech_log_data_pipeline_spark.operators.attribution import (
        position_attribution,
    )

    def credits(touch_rows):
        t, c = _mk_frames(spark, touch_rows, [(9, 1, 100)])
        rows = position_attribution(t, c, window_ms=1000).collect()
        return [r["credit"] for r in sorted(rows, key=lambda r: r["touch_id"])]

    assert credits([(1, 1, 10, "a")]) == [1000]
    assert credits([(1, 1, 10, "a"), (2, 1, 20, "b")]) == [500, 500]
    # n=5: endpoints 400 each, middle pool 200 over 3 -> 67,67,66
    assert credits([(i, 1, 10 * i, "a") for i in range(1, 6)]) == [
        400, 67, 67, 66, 400,
    ]
