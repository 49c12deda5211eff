"""Streaming quality-classifier scorer laws (streaming/quality.py):

1. batch identity — the stream result IS the quality_classifier relation
   (zero streaming state, so nothing can diverge);
2. slicing invariance — a multi-file replay arriving as many micro-batches
   produces the same rows;
3. the per-row fold handles the completion edge cases (null text,
   empty text) exactly like the batch classifier's left join;
4. model injection — a caller-supplied weight relation overrides training.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from adtech_log_data_pipeline_spark.functions.select import (
    quality_classifier,
    quality_weights,
)
from adtech_log_data_pipeline_spark.streaming.quality import (
    stream_quality_score,
)

SF = "/root/testdata/sf0.001"

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write_docs_fixture(spark, docs, sf: str) -> None:
    """documents.parquet as a single FILE (the testdata layout the
    stream's pathGlobFilter expects)."""
    d = os.path.join(sf, "documents.parquet.dir")
    docs.coalesce(1).write.mode("overwrite").parquet(d)
    f = [x for x in os.listdir(d) if x.endswith(".parquet") and not x.startswith(".")]
    os.rename(os.path.join(d, f[0]), os.path.join(sf, "documents.parquet"))


def _rows(spark, sf_dir=SF):
    from adtech_log_data_pipeline_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "documents")


def _as_tuples(df):
    return sorted(
        (r["doc_id"], r["lang"], r["n_tokens"], r["margin"], r["pred"])
        for r in df.collect()
    )


def test_stream_scorer_equals_batch_classifier(spark):
    got = _as_tuples(stream_quality_score(spark, SF))
    want = _as_tuples(quality_classifier(_rows(spark)))
    assert got == want and len(got) > 0


def test_multibatch_slicing_invariance(spark, tmp_path):
    """Documents replayed as 3 single-file micro-batches score
    identically — zero state means slicing cannot matter."""
    docs = _rows(spark).orderBy("doc_id").collect()
    third = (len(docs) + 2) // 3
    for i in range(3):
        part = docs[i * third : (i + 1) * third]
        p = os.path.join(str(tmp_path), f"part-{i}.parquet")
        spark.createDataFrame(part, _rows(spark).schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(p + ".dir")
        f = [
            x
            for x in os.listdir(p + ".dir")
            if x.endswith(".parquet") and not x.startswith(".")
        ]
        os.rename(os.path.join(p + ".dir", f[0]), p)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema(_rows(spark).schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(tmp_path))
    )
    sliced = stream_quality_score(spark, SF, documents=stream)
    assert _as_tuples(sliced) == _as_tuples(stream_quality_score(spark, SF))


def test_edge_docs_match_batch_completion(spark, tmp_path):
    """Null text (no tokens) and empty text ('' is one token) must score
    exactly as the batch classifier's every-document completion."""
    rows = [
        (1, "the quick fox", "en", "web", 13),
        (2, None, "en", "web", 0),
        (3, "   ", "de", "web", 3),
        (4, "der fuchs", "de", "web", 9),
        (5, "the the the", None, "web", 11),
    ]
    sf = os.path.join(str(tmp_path), "sf")
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    _write_docs_fixture(spark, docs, sf)
    got = _as_tuples(stream_quality_score(spark, sf))
    want = _as_tuples(quality_classifier(docs))
    assert got == want
    by_id = {t[0]: t for t in got}
    assert by_id[2][2:] == (0, 0, 0)  # null text: n_tokens 0, margin 0, pred 0
    assert by_id[3][2] == 1  # empty-after-trim text is ONE '' token


def test_injected_weights_override_training(spark, tmp_path):
    rows = [(1, "alpha beta", "en", "w", 10), (2, "gamma", "de", "w", 5)]
    sf = os.path.join(str(tmp_path), "sf")
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    _write_docs_fixture(spark, docs, sf)
    # all-zero weights -> every margin 0, pred 0
    zero = quality_weights(docs).select("bucket", F.lit(0).cast("bigint").alias("wt"))
    out = stream_quality_score(spark, sf, weights=zero)
    assert {(r["doc_id"], r["margin"], r["pred"]) for r in out.collect()} == {
        (1, 0, 0),
        (2, 0, 0),
    }
