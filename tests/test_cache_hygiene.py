"""Unpersist audit: a long-lived session running many declared queries must
not accumulate cached RDDs (functions/_cache.py registry + the _hygienic
wrapper in plans/queries.py release the previous query's holds).

At 100 TB a leaked persisted relation is executor memory gone for the rest
of the session — this pins the invariant, and bench.py asserts the same at
the end of every full bench run.
"""

from __future__ import annotations

from adtech_log_data_pipeline_spark.functions._cache import release_cached
from adtech_log_data_pipeline_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"

# cache-heavy queries: each holds >= 1 persisted relation while building
CACHED_QUERIES = [
    "similarity_lsh_topk",
    "similarity_ivf_topk",
    "embedding_near_dup",
    "dedup_minhash",
    "ngram_jaccard",
    "semantic_dedup",
    "dedup_incoming",
    "bigram_lm_score",
    "weighted_sample",
    "copurchase_pagerank",
    "incremental_rollup",
]


def _n_persistent_rdds(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_session_ends_with_zero_cached_rdds(spark):
    release_cached()
    for name in CACHED_QUERIES:
        QUERIES[name](spark, SF).write.format("noop").mode("overwrite").save()
        # while a query runs, at most ITS holds are cached; the next
        # query's _hygienic wrapper releases them
    release_cached()
    assert _n_persistent_rdds(spark) == 0


def test_hygienic_wrapper_caps_cached_frames(spark):
    """Mid-session (between two queries), only the in-flight query's holds
    may be cached — the previous query's are released by the wrapper."""
    release_cached()
    QUERIES["similarity_lsh_topk"](spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()
    after_first = _n_persistent_rdds(spark)
    QUERIES["similarity_ivf_topk"](spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()
    after_second = _n_persistent_rdds(spark)
    # each query holds exactly one relation (signatures / assignments):
    # the count must not grow as queries run
    assert after_second <= after_first
    release_cached()
    assert _n_persistent_rdds(spark) == 0
