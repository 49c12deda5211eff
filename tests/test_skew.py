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
