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


def test_skew_report_ranks_hot_keys(spark):
    from adtech_log_data_pipeline_spark.operators.skew import skew_report

    rows = (
        [("hot", i) for i in range(60)]
        + [("warm", i) for i in range(30)]
        + [("a", 1), ("b", 1), ("c", 1), ("d", 1), ("e", 1), (None, 1)]
    )
    df = spark.createDataFrame(rows, "k string, v long")
    out = skew_report(df, ["k"], top_n=3).collect()
    assert [(r["rank"], r["key"], r["n_rows"]) for r in out] == [
        (1, "hot", 60),
        (2, "warm", 30),
        (3, "a", 1),
    ]
    # 95 non-null rows over 7 keys: hot carries 60*7/95 = 4.42x the mean
    hot = out[0]
    assert hot["share_ppm"] == 60 * 1000000 // 95
    assert hot["skew_vs_mean_r6"] == round(60 * 7 / 95, 6)
    # deterministic tiebreak at equal counts: key ascending
    assert out[2]["key"] == "a"


def test_skew_report_top_n_avoids_global_sort(spark):
    """The top-N must plan as TakeOrdered (per-partition heaps), not a
    full global Sort+Exchange of the key-count relation."""
    from adtech_log_data_pipeline_spark.operators.skew import skew_report
    from adtech_log_data_pipeline_spark.functions._cache import release_cached

    df = spark.range(0, 1000).selectExpr("cast(id % 97 as string) as k", "id as v")
    plan = skew_report(df, ["k"], top_n=5)._jdf.queryExecution().executedPlan().toString()
    release_cached()
    assert "TakeOrderedAndProject" in plan


def test_aqe_skew_join_splits_hot_partition(spark):
    """The session's AQE skew-join path (session.py turns it on) must
    actually FIRE on a skewed shuffle join: with thresholds lowered to
    unit-test scale, the hot key's partition gets split and the final
    adaptive plan marks the shuffle read as skewed — the runtime half of
    the engine's skew story (operators/skew.py salting is the manual
    half for post-AQE residual skew)."""
    from pyspark.sql import functions as F

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
    )
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        hot = spark.range(200_000).select(
            F.lit(0).alias("k"), F.col("id").alias("v")
        )
        cold = spark.range(10_000).select(
            (F.col("id") % 1000 + 1).alias("k"), F.col("id").alias("v")
        )
        fact = hot.unionByName(cold)
        dim = spark.range(1001).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("d")
        )
        j = fact.join(dim, "k")
        assert len(j.collect()) == 210_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skewed" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
