"""Incremental join-view maintenance (operators/viewmaint.py): the IVM
delta law V_old ∪ ΔV == full join, multiset-exact, under random
append-only batches including duplicates and empty deltas."""

import random

from pyspark.sql import functions as F


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _law(spark, a_rows, da_rows, b_rows, db_rows):
    from adtech_log_data_pipeline_spark.operators.viewmaint import (
        delta_join_rows,
    )

    a_old = spark.createDataFrame(a_rows or [(None, None)], "k long, av long").filter(
        F.col("k").isNotNull()
    )
    da = spark.createDataFrame(da_rows or [(None, None)], "k long, av long").filter(
        F.col("k").isNotNull()
    )
    b_old = spark.createDataFrame(b_rows or [(None, None)], "k long, bv long").filter(
        F.col("k").isNotNull()
    )
    db = spark.createDataFrame(db_rows or [(None, None)], "k long, bv long").filter(
        F.col("k").isNotNull()
    )
    maintained = a_old.join(b_old, "k").unionByName(
        delta_join_rows(a_old, da, b_old, db, "k")
    )
    direct = a_old.unionByName(da).join(b_old.unionByName(db), "k")
    assert _rows(maintained) == _rows(direct)


def test_fuzz_ivm_law_random_batches(spark):
    rng = random.Random(8)
    for trial in range(6):
        def gen(n):
            return [
                (rng.randrange(8), rng.randrange(100)) for _ in range(n)
            ]

        _law(
            spark,
            gen(rng.randrange(0, 25)),
            gen(rng.randrange(0, 12)),
            gen(rng.randrange(0, 25)),
            gen(rng.randrange(0, 12)),
        )


def test_empty_deltas_yield_empty_delta_view(spark):
    from adtech_log_data_pipeline_spark.operators.viewmaint import (
        delta_join_rows,
    )

    a = spark.createDataFrame([(1, 10), (2, 20)], "k long, av long")
    b = spark.createDataFrame([(1, 5)], "k long, bv long")
    empty_a = a.filter(F.lit(False))
    empty_b = b.filter(F.lit(False))
    assert delta_join_rows(a, empty_a, b, empty_b, "k").count() == 0


def test_duplicate_join_keys_multiset_exact(spark):
    """Fan-out joins (duplicate keys on both sides) are where a
    set-based shortcut would silently under-count — the law is about
    MULTISETS."""
    _law(
        spark,
        [(1, 1), (1, 2)],
        [(1, 3)],
        [(1, 7), (1, 8)],
        [(1, 9), (1, 9)],
    )
