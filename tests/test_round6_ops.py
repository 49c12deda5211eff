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


class TestFrequentPartPairs:
    def test_hand_built_baskets(self, spark):
        from adtech_log_data_pipeline_spark.plans.relational import (
            frequent_part_pairs_sql,
        )

        spark.createDataFrame(
            [
                (1, 10), (1, 20), (1, 30),
                (2, 10), (2, 20),
                (3, 10), (3, 20), (3, 20),  # dup lineitem row: same basket
            ],
            "l_orderkey long, l_partkey long",
        ).createOrReplaceTempView("lineitem")
        rows = spark.sql(frequent_part_pairs_sql("spark")).collect()
        got = {(r["part_1"], r["part_2"]): (r["n_orders"], r["rnk"]) for r in rows}
        assert got == {(10, 20): (3, 1), (10, 30): (1, 2), (20, 30): (1, 3)}


class TestHourlyGapfill:
    def test_absent_hours_emitted_as_zero(self, spark):
        import datetime as dt

        from adtech_log_data_pipeline_spark.plans.relational import (
            hourly_gapfill_sql,
        )

        h = lambda k: dt.datetime(2024, 1, 1, k, 30)
        spark.createDataFrame(
            [
                (h(0), "click"), (h(0), "click"), (h(3), "click"),
                (h(1), "view"),
                (h(2), None),  # NULL type excluded entirely
            ],
            "ts timestamp, event_type string",
        ).createOrReplaceTempView("events")
        rows = spark.sql(hourly_gapfill_sql("spark")).collect()
        got = {(r["event_type"], r["epoch_hour"]): r["n_events"] for r in rows}
        h0 = int(dt.datetime(2024, 1, 1, 0).replace(
            tzinfo=dt.timezone.utc).timestamp()) // 3600
        # grid = 2 types x 4 hours (observed range h0..h0+3), gaps zero
        assert len(got) == 8
        assert got[("click", h0)] == 2
        assert got[("click", h0 + 1)] == 0
        assert got[("click", h0 + 2)] == 0
        assert got[("click", h0 + 3)] == 1
        assert got[("view", h0 + 1)] == 1
        assert got[("view", h0 + 3)] == 0

    def test_gapfill_against_vanilla_timezone(self, spark):
        """Buckets are integer epoch-ms hours — no session-timezone term."""
        from adtech_log_data_pipeline_spark.plans.relational import (
            hourly_gapfill_sql,
        )

        sql = hourly_gapfill_sql("spark")
        assert "session" not in sql.lower() and "from_utc" not in sql.lower()


class TestUserValueOutliers:
    def test_median_mad_hand_computed(self, spark):
        from adtech_log_data_pipeline_spark.plans.relational import (
            user_value_outliers_sql,
        )

        rows = [(i + 1, "purchase", float(v)) for i, v in
                enumerate([1, 2, 3, 4, 100])]
        spark.createDataFrame(
            rows, "user_id long, event_type string, value double"
        ).createOrReplaceTempView("events")
        out = spark.sql(user_value_outliers_sql("spark")).collect()
        # totals (micros): 1e6..4e6, 1e8; lower median = 3e6; adev sorted
        # = [0,1e6,1e6,2e6,97e6] -> MAD = 1e6; only user 5 crosses 3.5 MAD
        assert len(out) == 1
        r = out[0]
        assert r["user_id"] == 5
        assert r["med_micros"] == 3_000_000
        assert r["mad_micros"] == 1_000_000
        assert r["z_milli"] == 97_000


class TestWeightedPagerank:
    def test_one_iteration_hand_computed(self, spark):
        from adtech_log_data_pipeline_spark.functions.graph import (
            weighted_pagerank,
        )

        pairs = spark.createDataFrame(
            [(1, 2, 2), (2, 3, 1)], "p1 long, p2 long, w long"
        )
        got = {r["node"]: r for r in weighted_pagerank(pairs, iters=1).collect()}
        # deg: 1->2, 2->3, 3->1 ; contribs (r0 = 1e6):
        #   to 1: (1e6*2) div 3 = 666666 -> 150000 + 850*666666 div 1000
        #   to 2: (1e6*2) div 2 + (1e6*1) div 1 = 2e6 -> 150000 + 1700000
        #   to 3: (1e6*1) div 3 = 333333 -> 150000 + 283333
        assert got[1]["rank_micro"] == 150_000 + (850 * 666_666) // 1000
        assert got[2]["rank_micro"] == 1_850_000
        assert got[3]["rank_micro"] == 150_000 + (850 * 333_333) // 1000
        assert (got[1]["deg_w"], got[2]["deg_w"], got[3]["deg_w"]) == (2, 3, 1)

    def test_deterministic_across_runs_and_modes(self, spark):
        """Same ranks with and without the broadcast hint (plan choice can
        never change integer results)."""
        from adtech_log_data_pipeline_spark.functions.graph import (
            weighted_pagerank,
        )
        from adtech_log_data_pipeline_spark.functions._cache import (
            release_cached,
        )

        pairs = spark.createDataFrame(
            [(i % 7, 7 + (i * 3) % 11, 1 + i % 4) for i in range(40)],
            "p1 long, p2 long, w long",
        ).groupBy("p1", "p2").agg(F.sum("w").alias("w"))
        a = sorted(map(tuple, weighted_pagerank(pairs).collect()))
        release_cached()
        b = sorted(map(tuple, weighted_pagerank(
            pairs, broadcast_ranks=False).collect()))
        release_cached()
        assert a == b


class TestStreamDriftChi2:
    def test_windows_finalized_and_flag_consistent(self, spark):
        import pyspark.sql.functions as F

        from adtech_log_data_pipeline_spark.sources.tables import load_table
        from adtech_log_data_pipeline_spark.streaming.drift import (
            DRIFT_THRESHOLD_MILLI,
            stream_drift_chi2,
        )

        SF = "/root/testdata/sf0.001"
        out = stream_drift_chi2(spark, SF).collect()
        assert out, "bounded replay emitted no finalized windows"
        buckets = ["n_click", "n_error", "n_purchase", "n_signup", "n_view",
                   "n_other"]
        for r in out:
            assert r["n_total"] == sum(r[b] for b in buckets)
            assert r["chi2_milli"] >= 0
            assert r["drifted"] == int(r["chi2_milli"] >= DRIFT_THRESHOLD_MILLI)
        # append mode: exactly the batch windows with end <= watermark
        ev = load_table(spark, SF, "events").filter(
            F.col("event_type").isNotNull())
        wm = ev.agg(F.max(F.unix_millis("ts"))).collect()[0][0] - 1800000
        expected = (
            ev.groupBy(F.window("ts", "1 hour").alias("w"))
            .count()
            .filter(F.unix_millis(F.col("w.end")) <= wm)
        )
        assert len(out) == expected.count()


class TestKmvOverlap:
    def test_exact_below_k(self, spark):
        """When the union keeps fewer than k hashes the estimates ARE the
        exact distinct counts: A = 1..40, B = 21..60 -> union 60,
        intersection 20, Jaccard 1/3."""
        from adtech_log_data_pipeline_spark.functions.sketch import kmv_overlap

        rows = [("a", v) for v in range(1, 41)] + [
            ("b", v) for v in range(21, 61)
        ]
        df = spark.createDataFrame(rows * 2, "g string, v long")  # dups collapse
        out = kmv_overlap(df, "v", "g").collect()
        assert len(out) == 1
        r = out[0]
        assert (r["g_1"], r["g_2"]) == ("a", "b")
        assert r["n_union_kept"] == 60 and r["n_common"] == 20
        assert r["jaccard_ppm"] == 20 * 1_000_000 // 60
        assert r["est_union"] == 60.0
        assert r["est_intersection"] == 20.0

    def test_estimator_tracks_true_overlap(self, spark):
        """Above k: the sketch estimate must land within the standard
        KMV error envelope of the true values (loose 3-sigma-ish bound,
        ~1/sqrt(k-1) relative)."""
        from adtech_log_data_pipeline_spark.functions.sketch import (
            KMV_K,
            kmv_overlap,
        )

        n, shared = 4000, 2000
        rows = [("a", v) for v in range(n)] + [
            ("b", v) for v in range(n - shared, 2 * n - shared)
        ]
        df = spark.createDataFrame(rows, "g string, v long")
        r = kmv_overlap(df, "v", "g").collect()[0]
        true_union = 2 * n - shared
        rel = 3.0 / (KMV_K - 1) ** 0.5
        assert abs(r["est_union"] - true_union) <= true_union * rel
        assert abs(r["est_intersection"] - shared) <= true_union * rel


class TestValueDeciles:
    def test_ntile_hand_computed(self, spark):
        from adtech_log_data_pipeline_spark.plans.relational import (
            value_deciles_sql,
        )

        rows = [(i, "click", float(i)) for i in range(1, 13)]  # 12 rows
        spark.createDataFrame(
            rows, "event_id long, event_type string, value double"
        ).createOrReplaceTempView("events")
        out = {r["decile"]: r for r in
               spark.sql(value_deciles_sql("spark")).collect()}
        # SQL NTILE(10) over 12 rows: first two tiles get 2 rows
        assert [out[d]["n_rows"] for d in range(1, 11)] == [2, 2] + [1] * 8
        assert out[1]["lo_micros"] == 1_000_000
        assert out[1]["hi_micros"] == 2_000_000
        assert out[10]["lo_micros"] == out[10]["hi_micros"] == 12_000_000
        # boundaries are monotone across deciles
        for d in range(1, 10):
            assert out[d]["hi_micros"] <= out[d + 1]["lo_micros"]


class TestTypeTransitions:
    def test_hand_computed_matrix(self, spark):
        import datetime as dt

        from adtech_log_data_pipeline_spark.plans.relational import (
            type_transitions_sql,
        )

        t = lambda k: dt.datetime(2024, 1, 1, 0, k)
        spark.createDataFrame(
            [
                (1, 1, "click", t(1)), (2, 1, "view", t(2)),
                (3, 1, "click", t(3)),
                (4, 2, "view", t(1)), (5, 2, "view", t(2)),
            ],
            "event_id long, user_id long, event_type string, ts timestamp",
        ).createOrReplaceTempView("events")
        rows = {
            (r["prev_type"], r["next_type"]): r
            for r in spark.sql(type_transitions_sql("spark")).collect()
        }
        assert rows[("click", "view")]["n_transitions"] == 1
        assert rows[("click", "view")]["prob_ppm"] == 1_000_000
        assert rows[("view", "click")]["prob_ppm"] == 500_000
        assert rows[("view", "view")]["prob_ppm"] == 500_000
        assert len(rows) == 3


class TestCohortLtv:
    def test_hand_computed_cohorts(self, spark):
        import datetime as dt

        from adtech_log_data_pipeline_spark.plans.relational import (
            cohort_ltv_sql,
        )

        d = lambda y, m: dt.datetime(y, m, 15)
        spark.createDataFrame(
            [
                (1, d(2024, 1), 10.0), (1, d(2024, 1), 5.0),
                (1, d(2024, 3), 7.0),
                (2, d(2024, 2), 20.0),
            ],
            "o_custkey long, o_orderdate timestamp, o_totalprice double",
        ).createOrReplaceTempView("orders")
        rows = {
            (r["cohort_month"], r["months_since"]): r
            for r in spark.sql(cohort_ltv_sql("spark")).collect()
        }
        m0 = 2024 * 12 + 0  # January 2024
        assert rows[(m0, 0)]["n_orders"] == 2
        assert rows[(m0, 0)]["revenue_cents"] == 1500
        assert rows[(m0, 2)]["revenue_cents"] == 700
        assert rows[(m0 + 1, 0)]["n_customers"] == 1
        assert rows[(m0 + 1, 0)]["revenue_cents"] == 2000
        assert len(rows) == 3


class TestSegmentTrend:
    def test_ols_slope_hand_computed_including_negative(self, spark):
        import datetime as dt

        from adtech_log_data_pipeline_spark.plans.relational import (
            segment_trend_sql,
        )

        d = lambda k: dt.datetime(2024, 1, 1 + k, 12)
        rows = (
            # "up": days 0,1,2 with cents 100,200,300 -> slope 100 c/day
            [(i, "up", d(i), float(i + 1)) for i in range(3)]
            # "down": cents 300,200,100 -> slope -100 c/day
            + [(10 + i, "down", d(i), float(3 - i)) for i in range(3)]
            # "degenerate": single day -> zero denominator -> slope 0
            + [(20, "flat", d(0), 5.0)]
        )
        spark.createDataFrame(
            rows, "event_id long, event_type string, ts timestamp, value double"
        ).createOrReplaceTempView("events")
        out = {r["event_type"]: r for r in
               spark.sql(segment_trend_sql("spark")).collect()}
        assert out["up"]["slope_milli_cents_per_day"] == 100_000
        assert out["down"]["slope_milli_cents_per_day"] == -100_000
        assert out["flat"]["slope_milli_cents_per_day"] == 0
        assert out["up"]["n_days"] == 3 and out["flat"]["n_days"] == 1

    def test_negative_division_truncates_like_duckdb_floors(self, spark):
        """The sign-factored divide: -(|num| div den) must equal DuckDB's
        floor division of the SAME rewritten expression — pin with an
        inexact negative slope (num not divisible by den)."""
        import datetime as dt

        from adtech_log_data_pipeline_spark.plans.relational import (
            segment_trend_sql,
        )

        d = lambda k: dt.datetime(2024, 1, 1 + k, 12)
        # days 0,1,2 cents 300,299,100: num = 3*(-299+2*... hand value
        # checked against duckdb below — the point is both engines agree
        spark.createDataFrame(
            [(i, "seg", d(i), v) for i, v in enumerate([3.0, 2.99, 1.0])],
            "event_id long, event_type string, ts timestamp, value double",
        ).createOrReplaceTempView("events")
        spark_val = spark.sql(segment_trend_sql("spark")).collect()[0][
            "slope_milli_cents_per_day"
        ]
        import duckdb

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM (VALUES "
            "(1, 'seg', TIMESTAMP '2024-01-01 12:00:00', 3.0),"
            "(2, 'seg', TIMESTAMP '2024-01-02 12:00:00', 2.99),"
            "(3, 'seg', TIMESTAMP '2024-01-03 12:00:00', 1.0))"
            " t(event_id, event_type, ts, value)"
        )
        duck_val = con.sql(segment_trend_sql("duckdb")).fetchall()[0][-1]
        assert spark_val == duck_val


class TestTriangleStats:
    def _stats(self, spark, edges):
        from adtech_log_data_pipeline_spark.functions.graph import triangle_stats

        df = spark.createDataFrame(edges, "p1 long, p2 long")
        return triangle_stats(df).collect()[0]

    def test_matches_brute_force_on_random_graphs(self, spark):
        """Orientation count == transparent O(n^3) reference, including
        power-law-ish degree skew (a hub node in every edge sample)."""
        import itertools
        import random

        rng = random.Random(11)
        for trial in range(4):
            n = rng.randrange(6, 14)
            all_pairs = list(itertools.combinations(range(n), 2))
            edges = sorted(rng.sample(all_pairs, rng.randrange(3, len(all_pairs))))
            # skew: wire node 0 to everything in half the trials
            if trial % 2:
                edges = sorted(set(edges) | {(0, v) for v in range(1, n)})
            eset = set(edges)
            want_tri = sum(
                1
                for a, b, c in itertools.combinations(range(n), 3)
                if (a, b) in eset and (b, c) in eset and (a, c) in eset
            )
            deg = {}
            for a, b in edges:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            want_wedges = sum(d * (d - 1) // 2 for d in deg.values())
            row = self._stats(spark, edges)
            assert row["n_triangles"] == want_tri, edges
            assert row["n_wedges"] == want_wedges
            assert row["n_edges"] == len(edges)
            assert row["n_nodes"] == len(deg)
            if want_wedges:
                assert (
                    row["clustering_ppm"]
                    == 3000000 * want_tri // want_wedges
                )

    def test_triangle_free_graph(self, spark):
        # a path graph has wedges but no triangles
        row = self._stats(spark, [(1, 2), (2, 3), (3, 4)])
        assert row["n_triangles"] == 0 and row["clustering_ppm"] == 0
        assert row["n_wedges"] == 2

    def test_complete_graph_k4(self, spark):
        row = self._stats(
            spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
        )
        assert row["n_triangles"] == 4
        assert row["n_wedges"] == 12
        assert row["clustering_ppm"] == 1000000


class TestIntervalConcurrency:
    W = 10

    def _brute(self, ivals):
        """Independent reference: direct counting C(x) = #{i: s<=x<e},
        evaluated at bucket starts and every boundary point."""
        times = sorted({t for s, e in ivals for t in (s, e)})
        buckets = sorted({t // self.W for t in times})

        def C(x):
            return sum(1 for s, e in ivals if s <= x < e)

        out = {}
        for b in buckets:
            lo, hi = b * self.W, (b + 1) * self.W
            probe = [lo] + [t for t in times if lo <= t < hi]
            out[lo] = (
                C(lo),
                max(C(x) for x in probe),
                C(hi - 1),
            )
        return out

    def test_matches_direct_counting(self, spark):
        import random

        from adtech_log_data_pipeline_spark.operators.sweep import (
            interval_concurrency,
        )

        rng = random.Random(23)
        for _ in range(3):
            ivals = [
                (s, s + w)
                for s, w in (
                    (rng.randrange(0, 70), rng.choice([0, 1, 5, 9, 10, 27]))
                    for _ in range(25)
                )
            ]
            df = spark.createDataFrame(ivals, "s long, e long")
            got = {
                r["bucket_start"]: (r["n_start"], r["n_peak"], r["n_end"])
                for r in interval_concurrency(
                    df, start_col="s", end_col="e", bucket_width=self.W
                ).collect()
            }
            assert got == self._brute(ivals), ivals

    def test_back_to_back_intervals_never_concurrent(self, spark):
        from adtech_log_data_pipeline_spark.operators.sweep import (
            interval_concurrency,
        )

        # [0,5) then [5,10): the start and end at t=5 cancel in the net,
        # so the peak is 1, never 2
        df = spark.createDataFrame([(0, 5), (5, 10)], "s long, e long")
        rows = {
            r["bucket_start"]: r
            for r in interval_concurrency(
                df, start_col="s", end_col="e", bucket_width=10
            ).collect()
        }
        assert rows[0]["n_peak"] == 1 and rows[0]["n_end"] == 1
        assert rows[10]["n_start"] == 0 and rows[10]["n_end"] == 0


def test_weighted_median_matches_python_reference(spark):
    """The RANGE-frame weighted median must equal the textbook
    definition (smallest value whose cumulative weight reaches half the
    total) computed in plain Python over sf0.001 lineitem."""
    from adtech_log_data_pipeline_spark.plans.relational import (
        weighted_median_price_sql,
    )
    from adtech_log_data_pipeline_spark.sources.tables import register_tables

    SF = "/root/testdata/sf0.001"
    register_tables(spark, SF, ["lineitem"])
    got = {
        (r["y"], r["mo"]): (r["total_qty"], r["wmedian_price_cents"])
        for r in spark.sql(weighted_median_price_sql("spark")).collect()
    }
    rows = spark.sql(
        "SELECT cast(year(l_shipdate) as int) y,"
        " cast(month(l_shipdate) as int) mo,"
        " cast(floor(l_extendedprice * 100 + 0.5) as bigint) p,"
        " cast(l_quantity as bigint) q FROM lineitem"
    ).collect()
    groups: dict = {}
    for r in rows:
        groups.setdefault((r["y"], r["mo"]), []).append((r["p"], r["q"]))
    expect = {}
    for k, items in groups.items():
        tot = sum(q for _, q in items)
        cum = 0
        for p, q in sorted(items):
            cum += q
            if 2 * cum >= tot:
                expect[k] = (tot, p)
                break
    assert got == expect


def test_skyline_matches_bruteforce_fuzz(spark):
    """operators/skyline.py vs the quadratic dominance check on random
    integer point sets — duplicates, full ties on one axis, and
    domain-collapsed grids all exercised (fixed seed)."""
    import random

    from adtech_log_data_pipeline_spark.operators.skyline import skyline_2d

    rng = random.Random(8152026)
    for trial, (nx, ny, n) in enumerate(
        [(50, 50, 120), (4, 4, 80), (1, 10, 30), (10, 1, 30), (3, 100, 60)]
    ):
        pts = [
            (i, rng.randrange(nx), rng.randrange(ny)) for i in range(n)
        ]
        df = spark.createDataFrame(pts, "pid long, x long, y long")
        got = {r["pid"] for r in skyline_2d(df, "x", "y").collect()}
        expect = {
            pid
            for pid, x, y in pts
            if not any(
                qx >= x and qy >= y and (qx > x or qy > y)
                for _, qx, qy in pts
            )
        }
        assert got == expect, f"trial {trial}"


def test_funnel_pattern_window_boundaries(spark):
    """Step-window edges pinned: an earlier event exactly AT the later
    event's timestamp counts (inclusive upper); exactly 12h before does
    NOT (exclusive lower); 12h-1ms before does."""
    import pandas as pd

    from adtech_log_data_pipeline_spark.plans.northstar import q_funnel_pattern

    TOL = 43_200_000
    base = 1_700_000_000_000

    def events(rows):
        pdf = pd.DataFrame(
            [
                {
                    "event_id": i,
                    "ts": pd.Timestamp(ms, unit="ms"),
                    "user_id": u,
                    "event_type": t,
                    "value": 1.0,
                    "props": "{}",
                }
                for i, (u, t, ms) in enumerate(rows)
            ]
        )
        return spark.createDataFrame(pdf)

    cases = [
        # (view_ms, click_ms, purchase_ms, converts?)
        (base, base, base, True),            # zero-lag chain: inclusive
        (base - TOL, base, base + 1, False), # view exactly 12h before click
        (base - TOL + 1, base, base + 1, True),
        (base, base + TOL, base + TOL, False),  # click 12h after view
    ]
    import os, tempfile

    for i, (v, c, p, ok) in enumerate(cases):
        with tempfile.TemporaryDirectory() as d:
            events([(7, "view", v), (7, "click", c), (7, "purchase", p)]) \
                .write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
            rows = q_funnel_pattern(spark, d).collect()
            assert (len(rows) == 1) == ok, f"case {i}"


def test_penny_allocation_conservation_and_bounds(spark):
    """Largest-remainder proration laws on sf0.001: per-order allocated
    cents sum EXACTLY to the order total, and the allocation multiset
    per order matches a transparent pure-Python largest-remainder
    replay (the synthetic lineitem has duplicate (orderkey, linenumber)
    pairs, so the check is per-order multisets, not per-row keys)."""
    from collections import Counter

    from adtech_log_data_pipeline_spark.plans.relational import (
        penny_allocation_sql,
    )
    from adtech_log_data_pipeline_spark.sources.tables import register_tables

    SF = "/root/testdata/sf0.001"
    register_tables(spark, SF, ["lineitem", "orders"])
    rows = spark.sql(penny_allocation_sql("spark")).collect()
    got: dict = {}
    for r in rows:
        got.setdefault(r["orderkey"], []).append(r["alloc_cents"])
    totals = {
        r["o_orderkey"]: round(r["o_totalprice"] * 100)
        for r in spark.sql(
            "SELECT o_orderkey, o_totalprice FROM orders"
        ).collect()
    }
    lines: dict = {}
    for r in spark.sql(
        "SELECT l_orderkey ok, l_linenumber ln,"
        " cast(l_quantity as bigint) w FROM lineitem"
    ).collect():
        lines.setdefault(r["ok"], []).append((r["ln"], r["w"]))
    assert got  # non-trivial
    for ok, allocs in got.items():
        t = totals[ok]
        assert sum(allocs) == t, ok  # conservation, the headline law
        ws = lines[ok]
        W = sum(w for _, w in ws)
        base = [(t * w) // W for _, w in ws]
        leftover = t - sum(base)
        order = sorted(
            range(len(ws)),
            key=lambda i: (-((t * ws[i][1]) % W), ws[i][0], ws[i][1]),
        )
        for i in order[:leftover]:
            base[i] += 1
        assert Counter(allocs) == Counter(base), ok


def test_activity_streaks_matches_python_reference(spark):
    """Gaps-and-islands anchors vs a transparent day-set scan on
    sf0.001 events."""
    from adtech_log_data_pipeline_spark.plans.relational import (
        activity_streaks_sql,
    )
    from adtech_log_data_pipeline_spark.sources.tables import register_tables

    SF = "/root/testdata/sf0.001"
    register_tables(spark, SF, ["events"])
    got = {
        r["user_id"]: (
            r["longest_streak_days"], r["n_active_days"], r["n_streaks"]
        )
        for r in spark.sql(activity_streaks_sql("spark")).collect()
    }
    days: dict = {}
    for r in spark.sql(
        "SELECT user_id, unix_millis(ts) div 86400000 AS day FROM events"
        " WHERE user_id IS NOT NULL"
    ).collect():
        days.setdefault(r["user_id"], set()).add(r["day"])
    expect = {}
    for u, ds in days.items():
        sd = sorted(ds)
        runs, cur = [], 1
        for a, b in zip(sd, sd[1:]):
            if b == a + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        expect[u] = (max(runs), len(sd), len(runs))
    assert got == expect and any(v[2] > 1 for v in got.values())


def test_event_pivot_unpivot_roundtrip(spark):
    """Pivot/unpivot inverse law: melting the wide hourly matrix back
    with DataFrame.unpivot reproduces the flat (hour, event_type, n)
    counts exactly (zero cells melt to explicit zeros)."""
    from adtech_log_data_pipeline_spark.plans.northstar import (
        PIVOT_TYPES,
        q_event_pivot,
    )
    from adtech_log_data_pipeline_spark.sources.tables import load_table

    SF = "/root/testdata/sf0.001"
    wide = q_event_pivot(spark, SF)
    melted = {
        (r["hour"], r["event_type"]): r["n"]
        for r in wide.unpivot(
            "hour",
            [f"n_{t}" for t in PIVOT_TYPES],
            "event_type",
            "n",
        )
        .withColumn(
            "event_type", F.expr("substring(event_type, 3)")
        )
        .collect()
    }
    flat = {
        (r["hour"], r["event_type"]): r["n"]
        for r in load_table(spark, SF, "events")
        .filter(F.col("event_type").isin(PIVOT_TYPES))
        .select(
            F.expr("cast(unix_millis(ts) div 3600000 % 24 as int)").alias("hour"),
            "event_type",
        )
        .groupBy("hour", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for k, v in flat.items():
        assert melted[k] == v, k
    # cells absent from the flat counts must be explicit zeros in the melt
    assert all(v == 0 for k, v in melted.items() if k not in flat)
    assert len(melted) == 24 * len(PIVOT_TYPES) or len(melted) == len(
        {h for h, _ in melted}
    ) * len(PIVOT_TYPES)


def test_penny_allocation_adversarial_fuzz(spark):
    """Largest-remainder proration on adversarial synthetic orders:
    single-line orders, zero-weight lines, totals smaller than the line
    count, duplicate line numbers, equal remainders — conservation and
    the pure-Python replay must hold on all of them (fixed seed)."""
    import random
    from collections import Counter

    from adtech_log_data_pipeline_spark.plans.relational import (
        penny_allocation_sql,
    )

    rng = random.Random(614)
    orders, lines = [], []
    ok = 0
    def add(total_cents, ws):
        nonlocal ok
        orders.append((ok, total_cents / 100.0))
        for i, w in enumerate(ws):
            # duplicate line numbers on purpose (i // 2)
            lines.append((ok, i // 2 + 1, float(w)))
        ok += 1
    add(1, [1])                    # one cent, one line
    add(3, [5, 5, 5, 5])           # total < line count, all remainders equal
    add(100, [0, 7])               # zero-weight line
    add(999, [1])                  # single line takes everything
    add(250, [2, 2, 2, 2])         # even split with leftover
    for _ in range(10):
        add(rng.randrange(1, 10_000),
            [rng.randrange(0, 9) for _ in range(rng.randrange(1, 7))])
    # every order needs positive total weight (zero-weight ORDERS are
    # undefined for proration — the real schema guarantees quantity >= 1)
    by_ok = {}
    for o, ln, w in lines:
        by_ok.setdefault(o, []).append((ln, int(w)))
    for o, ws in by_ok.items():
        if sum(w for _, w in ws) == 0:
            lines.append((o, 99, 1.0))
            by_ok[o].append((99, 1))
    spark.createDataFrame(
        [(o, ln, w, 0.0, 0.0, 0.0, "x", "x", "x", "1996-01-01", q)
         for (o, ln, q) in lines for w in [q]],
        "l_orderkey long, l_linenumber int, l_quantity double,"
        " l_extendedprice double, l_discount double, l_tax double,"
        " l_returnflag string, l_linestatus string, l_shipmode_x string,"
        " l_shipdate string, _q double",
    ).drop("_q", "l_shipmode_x").createOrReplaceTempView("lineitem")
    spark.createDataFrame(
        [(o, t, "O", "p", "1996-01-01") for o, t in orders],
        "o_orderkey long, o_totalprice double, o_orderstatus string,"
        " o_orderpriority string, o_orderdate string",
    ).createOrReplaceTempView("orders")
    rows = spark.sql(penny_allocation_sql("spark")).collect()
    got: dict = {}
    for r in rows:
        got.setdefault(r["orderkey"], []).append(r["alloc_cents"])
    for o, total in orders:
        t = round(total * 100)
        ws = by_ok[o]
        assert sum(got[o]) == t, o
        W = sum(w for _, w in ws)
        base = [(t * w) // W for _, w in ws]
        leftover = t - sum(base)
        order = sorted(
            range(len(ws)),
            key=lambda i: (-((t * ws[i][1]) % W), ws[i][0], ws[i][1]),
        )
        for i in order[:leftover]:
            base[i] += 1
        assert Counter(got[o]) == Counter(base), o
    spark.catalog.dropTempView("lineitem")
    spark.catalog.dropTempView("orders")


def test_weighted_median_adversarial_fuzz(spark):
    """Weighted median on adversarial synthetic months: single rows,
    all-tied prices, one dominating weight, even-total half-exact
    crossings — RANGE-frame pick equals the textbook cumulative scan
    (fixed seed)."""
    import random

    from adtech_log_data_pipeline_spark.plans.relational import (
        weighted_median_price_sql,
    )

    rng = random.Random(77)
    rows = []
    def month(y, mo, items):
        for p_cents, q in items:
            rows.append((y, mo, p_cents / 100.0, float(q)))
    month(2001, 1, [(100, 1)])                      # single row
    month(2001, 2, [(500, 3), (500, 9), (500, 2)])  # all prices tied
    month(2001, 3, [(100, 1), (200, 1)])            # even total: 2*cum==tot at first row
    month(2001, 4, [(100, 99), (9999, 1)])          # dominating weight
    for mo in range(5, 11):
        month(2001, mo, [(rng.randrange(1, 50) * 100, rng.randrange(1, 9))
                         for _ in range(rng.randrange(1, 12))])
    spark.createDataFrame(
        [
            (i, q, p, f"{y}-{mo:02d}-15")
            for i, (y, mo, p, q) in enumerate(rows)
        ],
        "l_orderkey long, l_quantity double, l_extendedprice double,"
        " l_shipdate string",
    ).createOrReplaceTempView("lineitem")
    got = {
        (r["y"], r["mo"]): (r["total_qty"], r["wmedian_price_cents"])
        for r in spark.sql(weighted_median_price_sql("spark")).collect()
    }
    groups: dict = {}
    for y, mo, p, q in rows:
        groups.setdefault((y, mo), []).append((round(p * 100), int(q)))
    expect = {}
    for k, items in groups.items():
        tot = sum(q for _, q in items)
        cum = 0
        for p, q in sorted(items):
            cum += q
            if 2 * cum >= tot:
                expect[k] = (tot, p)
                break
    assert got == expect
    spark.catalog.dropTempView("lineitem")


def test_activity_streaks_synthetic_edges(spark):
    """Single-day users, fully-consecutive runs, fully-isolated days —
    the anchor formulation handles each; fixed-seed random day sets
    cross-checked against the scan."""
    import random

    from adtech_log_data_pipeline_spark.plans.relational import (
        activity_streaks_sql,
    )

    rng = random.Random(4)
    data = {1: [10], 2: list(range(5, 15)), 3: [1, 5, 9, 40]}
    for u in range(4, 12):
        data[u] = sorted(rng.sample(range(0, 40), rng.randrange(1, 15)))
    rows = [
        (i, u, d * 86_400_000 + 12_345)
        for i, (u, days) in enumerate(
            (u, d) for u, ds in data.items() for d in ds
        )
        for d in [days]
    ]
    import pandas as pd

    pdf = pd.DataFrame(
        [
            {"event_id": i, "user_id": u,
             "ts": pd.Timestamp(ms, unit="ms"),
             "event_type": "view", "value": 1.0, "props": "{}"}
            for i, u, ms in rows
        ]
    )
    spark.createDataFrame(pdf).createOrReplaceTempView("events")
    got = {
        r["user_id"]: (
            r["longest_streak_days"], r["n_active_days"], r["n_streaks"]
        )
        for r in spark.sql(activity_streaks_sql("spark")).collect()
    }
    for u, ds in data.items():
        runs, cur = [], 1
        for a, b in zip(ds, ds[1:]):
            cur = cur + 1 if b == a + 1 else (runs.append(cur) or 1)
        runs.append(cur)
        assert got[u] == (max(runs), len(ds), len(runs)), u
    spark.catalog.dropTempView("events")
