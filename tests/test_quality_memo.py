"""Quality-classifier scored-corpus memo + every-document completion laws.

The round-11 change: quality_classifier and quality_pr_curve share ONE
scoring pass via a build-once parquet artifact keyed by the documents
fixture fingerprint (plans/northstar.py::_qc_scored_for_fixture — the
discipline graph_reachability_indexed set). These tests pin the laws that
make the memo safe: artifact == fresh compute, fingerprint invalidation on
fixture rewrite, and the classifier's one-row-per-document contract
(token-less docs score margin 0, not vanish)."""

import os

import pytest
from pyspark.sql import functions as F


def _write_docs(spark, rows, path):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(path)


DOCS = [
    (1, "the quick brown fox", "en", "web", 19),
    (2, "the lazy dog sleeps by the door", "en", "web", 31),
    (3, "der schnelle braune fuchs", "de", "web", 25),
    (4, "the dog der fuchs", "de", "books", 17),
    (5, "  le renard  rapide ", "fr", "web", 20),
    (6, None, "en", "web", 0),  # null text -> no tokens at all
]


class TestEveryDocumentContract:
    def test_null_text_doc_scores_zero_not_dropped(self, spark):
        from adtech_log_data_pipeline_spark.functions.select import (
            quality_classifier,
        )

        docs = spark.createDataFrame(
            [(d[0], d[2], d[1]) for d in DOCS],
            "doc_id long, lang string, text string",
        )
        out = {
            r["doc_id"]: (r["n_tokens"], r["margin"], r["pred"])
            for r in quality_classifier(docs).collect()
        }
        assert set(out) == {1, 2, 3, 4, 5, 6}
        assert out[6] == (0, 0, 0)

    def test_null_lang_counts_as_negative_in_curve_label(self, spark):
        """The pr-curve label must use the same null semantics as the
        classifier's class split (null lang -> negative), not SQL
        three-valued logic that silently drops the row from both sums."""
        lbl = (
            spark.createDataFrame([("en",), ("de",), (None,)], "lang string")
            .select(
                F.when(F.col("lang") == "en", F.lit(1))
                .otherwise(F.lit(0))
                .cast("long")
                .alias("label")
            )
            .collect()
        )
        assert [r["label"] for r in lbl] == [1, 0, 0]


class TestScoredMemo:
    @pytest.fixture()
    def fixture_dir(self, spark, tmp_path, monkeypatch):
        monkeypatch.setenv("SPARK_GRAFT_QC_CACHE", str(tmp_path / "cache"))
        sf_dir = tmp_path / "sf"
        _write_docs(spark, DOCS, str(sf_dir / "documents.parquet"))
        return str(sf_dir)

    def test_artifact_equals_fresh_compute(self, spark, fixture_dir):
        from adtech_log_data_pipeline_spark.functions.select import (
            quality_classifier,
        )
        from adtech_log_data_pipeline_spark.plans.northstar import (
            _qc_scored_for_fixture,
        )
        from adtech_log_data_pipeline_spark.sources.tables import load_table

        memo = sorted(
            tuple(r) for r in _qc_scored_for_fixture(spark, fixture_dir).collect()
        )
        fresh = sorted(
            tuple(r)
            for r in quality_classifier(
                load_table(spark, fixture_dir, "documents")
            )
            .select("doc_id", "lang", "n_tokens", "margin", "pred")
            .collect()
        )
        assert memo == fresh and len(memo) == len(DOCS)

    def test_second_call_reuses_artifact(self, spark, fixture_dir, tmp_path):
        from adtech_log_data_pipeline_spark.plans.northstar import (
            _qc_scored_for_fixture,
        )

        a = _qc_scored_for_fixture(spark, fixture_dir).collect()
        cache = tmp_path / "cache"
        built = sorted(os.listdir(cache))
        b = _qc_scored_for_fixture(spark, fixture_dir).collect()
        assert sorted(os.listdir(cache)) == built  # no second build dir
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_fixture_rewrite_invalidates_key(self, spark, fixture_dir, tmp_path):
        from adtech_log_data_pipeline_spark.plans.northstar import (
            _qc_scored_for_fixture,
        )

        before = _qc_scored_for_fixture(spark, fixture_dir).count()
        _write_docs(
            spark,
            DOCS + [(7, "brand new english words here", "en", "web", 28)],
            os.path.join(fixture_dir, "documents.parquet"),
        )
        after = _qc_scored_for_fixture(spark, fixture_dir)
        assert after.count() == before + 1
        assert {r["doc_id"] for r in after.collect()} == {1, 2, 3, 4, 5, 6, 7}

    def test_pr_curve_consumes_memo(self, spark, fixture_dir):
        """quality_pr_curve over the artifact == pr_curve_exact over a
        fresh classifier run with the null-safe label."""
        from adtech_log_data_pipeline_spark.functions.evaluate import (
            pr_curve_exact,
        )
        from adtech_log_data_pipeline_spark.functions.select import (
            quality_classifier,
        )
        from adtech_log_data_pipeline_spark.plans.northstar import (
            q_quality_pr_curve,
        )
        from adtech_log_data_pipeline_spark.sources.tables import load_table

        got = sorted(
            tuple(r) for r in q_quality_pr_curve(spark, fixture_dir).collect()
        )
        fresh = quality_classifier(
            load_table(spark, fixture_dir, "documents")
        ).select(
            "margin",
            F.when(F.col("lang") == "en", F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("label"),
        )
        want = sorted(
            tuple(r)
            for r in pr_curve_exact(
                fresh, score_col="margin", label_col="label"
            ).collect()
        )
        assert got == want and len(got) > 0

    def test_weights_artifact_equals_fresh(self, spark, fixture_dir, monkeypatch, tmp_path):
        from adtech_log_data_pipeline_spark.functions.select import (
            quality_weights,
        )
        from adtech_log_data_pipeline_spark.plans.northstar import (
            _qc_weights_for_fixture,
        )
        from adtech_log_data_pipeline_spark.sources.tables import load_table

        monkeypatch.setenv("SPARK_GRAFT_QC_CACHE_W", str(tmp_path / "wcache"))
        memo = sorted(
            tuple(r) for r in _qc_weights_for_fixture(spark, fixture_dir).collect()
        )
        fresh = sorted(
            tuple(r)
            for r in quality_weights(
                load_table(spark, fixture_dir, "documents")
            ).collect()
        )
        assert memo == fresh and 0 < len(memo) <= 512
