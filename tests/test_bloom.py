"""Bloom semi-join reduction laws (operators/bloom.py): no false
negatives, result-transparency vs the plain join, real map-side pruning,
and the filter's presence in the physical plan."""

from pyspark.sql import functions as F

from adtech_log_data_pipeline_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_pruned_join,
    bloom_selectivity,
)


def _dim(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k long")


def test_bloom_has_no_false_negatives(spark):
    """Every build-side key must probe true — a false negative would
    silently drop JOIN MATCHES, the one failure mode that corrupts
    results instead of costing shuffle bytes."""
    keys = [(i * 2654435761) % (1 << 40) for i in range(2000)]
    words = bloom_build(_dim(spark, keys), "k", n_words=128)
    missed = (
        _dim(spark, keys)
        .filter(~bloom_might_contain(F.col("k"), words))
        .count()
    )
    assert missed == 0


def test_bloom_pruned_join_equals_plain_join_with_multiplicity(spark):
    """The pruned join must reproduce the plain inner join EXACTLY,
    including duplicate fact rows per key (multiplicity preservation)."""
    dim = _dim(spark, [1, 2, 3, 50, 51]).withColumn("d", F.col("k") * 10)
    facts = spark.createDataFrame(
        [(k, v) for k in range(60) for v in (0, 1)], "k long, v int"
    )
    got = sorted(
        (r["k"], r["v"], r["d"])
        for r in bloom_pruned_join(facts, dim, "k", n_words=64).collect()
    )
    want = sorted(
        (r["k"], r["v"], r["d"]) for r in facts.join(dim, "k").collect()
    )
    assert got == want and len(want) == 10


def test_bloom_prunes_nonmatching_fact_rows(spark):
    """On disjoint-heavy facts a sized bitmap admits matches plus only a
    small FP tail — the shuffle-row reduction is real, not vacuous."""
    dim = _dim(spark, range(0, 10000, 100))  # 100 keys
    facts = _dim(spark, range(10000))  # 1% match rate
    admitted, total = bloom_selectivity(facts, dim, "k", n_words=256)
    assert total == 10000
    assert 100 <= admitted < 1000  # all matches + a bounded FP tail


def test_bloom_filter_sits_on_fact_side_of_the_plan(spark):
    """Plan shape: the xxhash64 probe filter must exist in the executed
    plan (map-side, before the join) — the reduction is a plan property,
    not just a result property."""
    dim = _dim(spark, [1, 2, 3])
    facts = _dim(spark, range(1000)).withColumn("v", F.col("k") + 1)
    out = bloom_pruned_join(facts, dim, "k", n_words=64)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan
