"""Salted distinct-count must equal the plain countDistinct on skewed and
uniform inputs alike."""

from pyspark.sql import functions as F

from adtech_log_data_pipeline_spark.operators.skew import salted_count_distinct


def test_salted_equals_plain_on_skewed_data(spark):
    # one viral key holding 90% of rows + a long tail
    rows = [("viral", f"u{i % 137}") for i in range(2000)] + [
        (f"k{i % 7}", f"u{i % 23}") for i in range(200)
    ]
    df = spark.createDataFrame(rows, "bundle string, user string")
    plain = {
        r["bundle"]: r["n"]
        for r in df.groupBy("bundle").agg(F.countDistinct("user").alias("n")).collect()
    }
    salted = {
        r["bundle"]: r["n_distinct"]
        for r in salted_count_distinct(df, ["bundle"], ["user"], n_salts=8).collect()
    }
    assert salted == plain
    assert salted["viral"] == 137


def test_salted_multi_column_values(spark):
    rows = [("k", "a", i % 5) for i in range(100)] + [("k2", "b", 1)]
    df = spark.createDataFrame(rows, "key string, os string, uid int")
    out = {
        r["key"]: r["n_distinct"]
        for r in salted_count_distinct(df, ["key"], ["os", "uid"], n_salts=4).collect()
    }
    assert out == {"k": 5, "k2": 1}


def test_salted_join_equals_plain_join(spark):
    """salted_join == plain join (row multiset) for inner and left,
    including unmatched fact keys and duplicate dim rows."""
    from adtech_log_data_pipeline_spark.operators.skew import salted_join

    facts = spark.createDataFrame(
        # hot key 'a' dominates; 'c' has no dim match
        [("a", i) for i in range(200)] + [("b", 1), ("c", 2), ("b", 3)],
        "k string, v int",
    )
    dim = spark.createDataFrame(
        [("a", "A1"), ("a", "A2"), ("b", "B")], "k string, label string"
    )
    for how in ("inner", "left"):
        got = salted_join(facts, dim, "k", n_salts=7, how=how)
        want = facts.join(dim, "k", how)
        assert got.exceptAll(want).count() == 0, how
        assert want.exceptAll(got).count() == 0, how

    import pytest

    with pytest.raises(ValueError):
        salted_join(facts, dim, "k", how="full")
