"""Round-6 mid-round operators: referential-integrity audit, bigram-LM
perplexity scoring, deletion-neighborhood record linkage, and the exact
weighted systematic sampler — hand-computed laws, not snapshots."""

import pytest

from pyspark.sql import functions as F


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


class TestBigramLmScore:
    def test_hand_computed_surprise(self, spark):
        """Corpus: c12/c1/V computed by hand; add-one smoothing and the
        integer log2 bucket follow exactly."""
        from adtech_log_data_pipeline_spark.functions.text import bigram_lm_score

        rows = {
            r["doc_id"]: r
            for r in bigram_lm_score(
                _docs(spark, ["a b a b", "a b", "x y"])
            ).collect()
        }
        # bigrams: doc0 (a,b)(b,a)(a,b); doc1 (a,b); doc2 (x,y)
        # c12: (a,b)=3 (b,a)=1 (x,y)=1 ; c1: a=3 b=1 x=1 ; V=3
        # bits(a,b) = bitlen((3+3) div (3+1)) = bitlen(1) = 1
        # bits(b,a) = bits(x,y) = bitlen((1+3) div (1+1)) = bitlen(2) = 2
        assert rows[0]["n_bigrams"] == 3
        assert rows[0]["sum_bits"] == 1 + 2 + 1
        assert rows[0]["ppl_milli"] == (4 * 1000) // 3
        assert rows[1]["sum_bits"] == 1 and rows[1]["ppl_milli"] == 1000
        assert rows[2]["sum_bits"] == 2 and rows[2]["ppl_milli"] == 2000

    def test_single_token_docs_excluded(self, spark):
        from adtech_log_data_pipeline_spark.functions.text import bigram_lm_score

        out = bigram_lm_score(_docs(spark, ["solo", "a b"])).collect()
        assert {r["doc_id"] for r in out} == {1}

    def test_repetitive_text_scores_lower(self, spark):
        """The filter's purpose: looping text is more predictable than
        shuffled text under the corpus-trained model."""
        from adtech_log_data_pipeline_spark.functions.text import bigram_lm_score

        texts = ["the cat sat on the mat " * 5, "mat the on sat the cat on"]
        rows = {
            r["doc_id"]: r["ppl_milli"]
            for r in bigram_lm_score(_docs(spark, texts)).collect()
        }
        assert rows[0] < rows[1]


class TestTokenSetNearDup:
    def test_one_edit_pairs_found_two_edit_pairs_not(self, spark):
        from adtech_log_data_pipeline_spark.functions.dedup import (
            token_set_near_dup,
        )

        df = spark.createDataFrame(
            [
                (1, "red widget Brand#1 ECONOMY 5"),
                (2, "red widget Brand#1 ECONOMY 7"),  # one token off 1
                (3, "red widget Brand#2 STANDARD 5"),  # two tokens off 1
                (4, "red widget Brand#1 ECONOMY 5"),  # identical to 1
                (5, "red widget Brand#1 ECONOMY"),  # strict subset of 1
            ],
            "id long, sig string",
        )
        out = token_set_near_dup(df, "id", "sig")
        pairs = {(r["id_1"], r["id_2"]): r for r in out.collect()}
        assert set(pairs) == {(1, 2), (1, 4), (1, 5), (2, 4), (2, 5), (4, 5)}
        assert pairs[(1, 4)]["overlap"] == 5  # exact duplicate
        assert pairs[(1, 2)]["overlap"] == 4  # one-attribute edit
        assert pairs[(1, 5)]["overlap"] == 4  # subset: |B| = |A| - 1
        # every emitted pair satisfies the predicate (banding is exact)
        for r in pairs.values():
            assert r["overlap"] >= max(r["n_tokens_1"], r["n_tokens_2"]) - 1

    def test_duplicate_words_collapse_to_a_set(self, spark):
        """Token SETS: repeated words don't change the signature."""
        from adtech_log_data_pipeline_spark.functions.dedup import (
            token_set_near_dup,
        )

        df = spark.createDataFrame(
            [(1, "a b b c"), (2, "c b a a")], "id long, sig string"
        )
        out = token_set_near_dup(df, "id", "sig").collect()
        assert len(out) == 1 and out[0]["overlap"] == 3


class TestWeightedSystematicSample:
    def test_matches_naive_prefix_scan(self, spark):
        """The two-phase bucket decomposition must equal the textbook
        single-pass definition, computed here in plain Python; forcing
        bucket_span=3 exercises many buckets + the offset join."""
        from adtech_log_data_pipeline_spark.functions.text import (
            weighted_systematic_sample,
        )

        weights = [7, 0, 13, 1, 1, 40, 2, 9, 0, 5, 30, 3]
        docs = spark.createDataFrame(
            [(i, "t", "en", "web", w) for i, w in enumerate(weights)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        n_picks = 5
        out = {
            r["doc_id"]: r
            for r in weighted_systematic_sample(
                docs, n_picks=n_picks, bucket_span=3
            ).collect()
        }
        total = sum(weights)
        step = max(total // n_picks, 1)
        cum = 0
        expected = {}
        for i, w in enumerate(weights):
            prev, cum = cum, cum + w
            hits = cum // step - prev // step
            if hits > 0:
                expected[i] = (w, cum, hits)
        assert {
            k: (v["weight"], v["cum_chars"], v["n_hits"]) for k, v in out.items()
        } == expected
        # exact realized quota: every multiple of step in (0, total] hits
        # exactly one row
        assert sum(v["n_hits"] for v in out.values()) == total // step

    def test_zero_weight_rows_never_picked(self, spark):
        from adtech_log_data_pipeline_spark.functions.text import (
            weighted_systematic_sample,
        )

        docs = spark.createDataFrame(
            [(i, "t", "en", "web", 0 if i % 2 else 10) for i in range(20)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        out = weighted_systematic_sample(docs, n_picks=10, bucket_span=4)
        assert all(r["weight"] > 0 for r in out.collect())


class TestFkIntegrityAudit:
    def test_orphans_and_null_keys_counted_separately(self, spark):
        from adtech_log_data_pipeline_spark.plans.relational import (
            fk_integrity_audit_sql,
        )

        spark.createDataFrame([(0, "AMERICA")], "r_regionkey long, r_name string"
                              ).createOrReplaceTempView("region")
        spark.createDataFrame(
            [(0, "usa", 0), (1, "atlantis", 99)],
            "n_nationkey long, n_name string, n_regionkey long",
        ).createOrReplaceTempView("nation")
        spark.createDataFrame(
            [(0, 0), (1, 42), (2, None)], "c_custkey long, c_nationkey long"
        ).createOrReplaceTempView("customer")
        spark.createDataFrame(
            [(0, 0)], "s_suppkey long, s_nationkey long"
        ).createOrReplaceTempView("supplier")
        spark.createDataFrame([(0,)], "p_partkey long").createOrReplaceTempView(
            "part"
        )
        spark.createDataFrame(
            [(0, 0), (1, 77)], "o_orderkey long, o_custkey long"
        ).createOrReplaceTempView("orders")
        spark.createDataFrame(
            [(0, 0, 0), (5, 3, 0)],
            "l_orderkey long, l_partkey long, l_suppkey long",
        ).createOrReplaceTempView("lineitem")

        rows = {
            r["fk_edge"]: r
            for r in spark.sql(fk_integrity_audit_sql("spark")).collect()
        }
        assert len(rows) == 7
        e = rows["nation.n_regionkey->region"]
        assert (e["n_child_rows"], e["n_orphans"], e["n_null_keys"]) == (2, 1, 0)
        e = rows["customer.c_nationkey->nation"]
        assert (e["n_child_rows"], e["n_orphans"], e["n_null_keys"]) == (3, 1, 1)
        e = rows["orders.o_custkey->customer"]
        assert e["n_orphans"] == 1
        e = rows["lineitem.l_orderkey->orders"]
        assert e["n_orphans"] == 1
        e = rows["lineitem.l_partkey->part"]
        assert e["n_orphans"] == 1
        e = rows["lineitem.l_suppkey->supplier"]
        assert e["n_orphans"] == 0
        e = rows["supplier.s_nationkey->nation"]
        assert e["n_orphans"] == 0
