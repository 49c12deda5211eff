"""Round-9 operators: k-anonymity/l-diversity audit, DSIR importance
selection, reciprocal-rank ANN audit, split-conformal coverage —
hand-computed laws and pure-Python replays, not snapshots."""

import hashlib
import math

import pytest

from pyspark.sql import functions as F


def _customers(spark, rows):
    return spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    )


class TestKAnonymityAudit:
    def test_hand_computed_census(self, spark):
        """Two nations, balances chosen so width=100 separates what
        width=2000 merges; recount everything by hand."""
        from adtech_log_data_pipeline_spark.functions.privacy import (
            k_anonymity_audit,
        )

        rows = [
            # nation 1: 50.0, 60.0 (same 100-bucket), 350.0
            (0, "a", 1, 50.0, "AUTO"),
            (1, "b", 1, 60.0, "AUTO"),
            (2, "c", 1, 350.0, "HOUSE"),
            # nation 2: two rows far apart
            (3, "d", 2, 50.0, "AUTO"),
            (4, "e", 2, 9000.0, "HOUSE"),
        ]
        out = {
            r["width"]: r
            for r in k_anonymity_audit(
                _customers(spark, rows), widths=(100, 20000), k=2
            ).collect()
        }
        # width=100 (cents buckets of 10000, offset 100000):
        #   n1: {50,60} together (class of 2), {350} alone
        #   n2: {50} alone, {9000} alone  -> 4 classes, k=1
        w = out[100]
        assert w["n_classes"] == 4
        assert w["k_anonymity"] == 1
        assert w["rows_at_risk"] == 3  # the three singleton classes
        assert w["risk_ppm"] == (3 * 1_000_000) // 5
        # width=20000 dollars: every balance in bucket 0 -> one class
        # per nation
        w = out[20000]
        assert w["n_classes"] == 2
        assert w["k_anonymity"] == 2
        assert w["rows_at_risk"] == 0 and w["risk_ppm"] == 0
        # l-diversity: nation1 class {AUTO, HOUSE} has 2, nation2 same
        assert w["l_diversity"] == 2

    def test_negative_balances_bucket_consistently(self, spark):
        """The cents offset keeps the dividend non-negative: -1.0 and
        -99.0 share the width-100 bucket; -101.0 does not."""
        from adtech_log_data_pipeline_spark.functions.privacy import (
            k_anonymity_audit,
        )

        rows = [
            (0, "a", 1, -1.0, "AUTO"),
            (1, "b", 1, -99.0, "AUTO"),
            (2, "c", 1, -101.0, "AUTO"),
        ]
        out = k_anonymity_audit(
            _customers(spark, rows), widths=(100,), k=2
        ).collect()[0]
        # offset 100000 cents, buckets of 10000 cents:
        # -1.0 -> 99900//10000=9, -99.0 -> 90100//10000=9,
        # -101.0 -> 89900//10000=8 -> classes {a,b} and {c}
        assert out["n_classes"] == 2
        assert out["k_anonymity"] == 1
        assert out["rows_at_risk"] == 1


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )


class TestDsirSelection:
    def test_hand_computed_weights(self, spark):
        """Three docs, two English: token weights recomputed by hand
        with bit_length buckets."""
        from adtech_log_data_pipeline_spark.functions.select import (
            dsir_selection,
        )

        rows = [
            (0, "alpha alpha beta", "en", "s", 16),
            (1, "alpha gamma", "en", "s", 11),
            (2, "beta beta gamma", "de", "s", 15),
        ]
        out = {
            r["doc_id"]: r
            for r in dsir_selection(_docs(spark, rows), top_n=3).collect()
        }
        # counts: alpha c_raw=3 c_tgt=3; beta c_raw=3 c_tgt=1;
        #         gamma c_raw=2 c_tgt=1
        bl = int.bit_length
        w = {
            "alpha": bl(4) - bl(4),   # 0
            "beta": bl(2) - bl(4),    # 2 - 3 = -1
            "gamma": bl(2) - bl(3),   # 2 - 2 = 0
        }
        assert out[0]["sum_weight"] == 2 * w["alpha"] + w["beta"]
        assert out[1]["sum_weight"] == w["alpha"] + w["gamma"]
        assert out[2]["sum_weight"] == 2 * w["beta"] + w["gamma"]
        # ranking: doc1 (0) > doc0 (-1) > doc2 (-2); ranks dense 1..3
        assert out[1]["rank"] == 1
        assert out[0]["rank"] == 2
        assert out[2]["rank"] == 3

    def test_english_slice_outranks_on_target_tokens(self, spark):
        """A doc made of target-heavy tokens must outrank one made of
        off-target tokens of the same length."""
        from adtech_log_data_pipeline_spark.functions.select import (
            dsir_selection,
        )

        rows = [(i, "common words here", "en", "s", 17) for i in range(8)]
        rows += [(100 + i, "fremde worte hier", "de", "s", 17) for i in range(8)]
        rows += [(200, "common words here", "de", "s", 17)]
        out = {r["doc_id"]: r["sum_weight"] for r in dsir_selection(
            _docs(spark, rows), top_n=20
        ).collect()}
        assert out[0] > out[100]
        # the English-looking German doc scores like the English ones
        # (the weight is a property of the tokens, not the label)
        assert out[200] == out[0]


def _emb(spark, vecs, labels=None):
    labels = labels or [0] * len(vecs)
    return spark.createDataFrame(
        [(i, [float(x) for x in v], int(l)) for i, (v, l) in
         enumerate(zip(vecs, labels))],
        "vec_id long, embedding array<float>, label int",
    )


class TestRetrievalMrr:
    def test_rr_is_reciprocal_of_lsh_rank(self, spark):
        """Cross-check: join the audit against the two gated chains it
        composes — wherever the true top-1 appears in the LSH top-k, the
        audit's rank and micros must match; where absent, zeros."""
        from adtech_log_data_pipeline_spark.functions.evaluate import (
            retrieval_mrr,
        )
        from adtech_log_data_pipeline_spark.functions.similarity import (
            brute_force_topk,
            lsh_topk,
        )

        import random

        rng = random.Random(7)
        vecs = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(60)]
        emb = _emb(spark, vecs)
        q = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qvec"),
        )
        audit = {r["query_id"]: r for r in
                 retrieval_mrr(emb, q, k=10, total=60).collect()}
        truth = {r["query_id"]: r["neighbor_id"] for r in
                 brute_force_topk(emb, q, k=1).collect()}
        lsh = {(r["query_id"], r["neighbor_id"]): r["rank"] for r in
               lsh_topk(emb, q, k=10, total=60).collect()}
        assert set(audit) == set(truth)
        for qid, row in audit.items():
            assert row["true_top1"] == truth[qid]
            rank = lsh.get((qid, truth[qid]), 0)
            assert row["found_rank"] == rank
            assert row["rr_micro"] == (1_000_000 // rank if rank else 0)


class TestConformalCoverage:
    def _events(self, spark, rows):
        return spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
        )

    @staticmethod
    def _is_cal(event_id: int) -> bool:
        h = hashlib.md5(str(event_id).encode()).hexdigest()[:8]
        return int(h, 16) % 2 == 0

    def test_pure_python_replay(self, spark):
        """Replay the whole conformal recipe in pure Python on a fixed
        fixture and compare every output cell."""
        from adtech_log_data_pipeline_spark.functions.evaluate import (
            conformal_coverage,
        )

        import random

        rng = random.Random(3)
        rows = [
            (i, None, i % 7, "click", round(rng.uniform(0, 50), 2), None)
            for i in range(400)
        ]
        out = {r["event_type"]: r for r in
               conformal_coverage(self._events(spark, rows)).collect()}

        cal = [round(v * 100) for (i, _, _, _, v, _) in rows
               if self._is_cal(i)]
        ev = [round(v * 100) for (i, _, _, _, v, _) in rows
              if not self._is_cal(i)]
        n_cal = len(cal)
        q_index = math.ceil((n_cal + 1) * 0.9)
        thr = sorted(cal)[min(q_index, n_cal) - 1]
        covered = sum(1 for c in ev if c <= thr)
        row = out["click"]
        assert row["n_cal"] == n_cal
        assert row["n_eval"] == len(ev)
        assert row["q_index"] == q_index
        assert row["threshold_cents"] == thr
        assert row["n_covered"] == covered
        assert row["coverage_ppm"] == covered * 1_000_000 // len(ev)
        # the conformal guarantee on exchangeable data: coverage should
        # sit near (>= with slack) 1 - alpha
        assert row["coverage_ppm"] >= 850_000

    def test_duplicate_scores_pick_order_statistic(self, spark):
        """Heavy ties: the threshold is the q-th smallest VALUE, which
        the per-distinct-score prefix scan must still pick correctly."""
        from adtech_log_data_pipeline_spark.functions.evaluate import (
            conformal_coverage,
        )

        rows = [(i, None, 1, "buy", float(i % 3), None) for i in range(60)]
        out = conformal_coverage(self._events(spark, rows)).collect()[0]
        cal = sorted(
            round((i % 3) * 100) for i in range(60) if self._is_cal(i)
        )
        q_index = math.ceil((len(cal) + 1) * 0.9)
        assert out["threshold_cents"] == cal[min(q_index, len(cal)) - 1]


class TestKcorePeel:
    def test_pure_python_peel_replay(self, spark):
        """Replay bounded peeling in pure Python on a hand graph: a
        4-clique (3-core) plus a tail that peels away round by round."""
        from adtech_log_data_pipeline_spark.functions.graph import kcore_peel

        # 4-clique {0,1,2,3}; chain 3-4-5 hanging off it
        und = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
               (3, 4), (4, 5)]
        pairs = spark.createDataFrame(
            [(a, b, 1) for a, b in und], "p1 long, p2 long, w long"
        )
        out = {r["round"]: r for r in
               kcore_peel(pairs, k=3, rounds=3).collect()}

        adj = {}
        for a, b in und:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        for rnd in range(4):
            degs = {n: len(v) for n, v in adj.items() if v}
            row = out[rnd]
            if degs:
                assert row["n_alive"] == len(degs)
                assert row["n_edges"] == sum(degs.values())
                assert row["min_deg"] == min(degs.values())
                assert row["max_deg"] == max(degs.values())
            else:
                assert row["n_alive"] == 0
                assert row["n_edges"] is None and row["min_deg"] is None
            alive = {n for n, d in degs.items() if d >= 3}
            adj = {n: (v & alive) for n, v in adj.items() if n in alive}

    def test_stable_core_is_fixpoint(self, spark):
        """A clique with degree >= k never peels: every round reports the
        same census."""
        from adtech_log_data_pipeline_spark.functions.graph import kcore_peel

        und = [(a, b) for a in range(5) for b in range(a + 1, 5)]
        pairs = spark.createDataFrame(
            [(a, b, 1) for a, b in und], "p1 long, p2 long, w long"
        )
        rows = kcore_peel(pairs, k=4, rounds=2).collect()
        assert len({(r["n_alive"], r["n_edges"]) for r in rows}) == 1
        assert rows[0]["n_alive"] == 5 and rows[0]["min_deg"] == 4


class TestHybridRrf:
    def test_pure_python_fusion_replay(self, spark):
        """Fuse two hand-made top-k lists; replay RRF in pure Python."""
        from adtech_log_data_pipeline_spark.functions.retrieval import (
            hybrid_rrf,
        )

        bm = spark.createDataFrame(
            [(10, 1), (11, 2), (12, 3)], "doc_id long, rank int"
        )
        cos = spark.createDataFrame(
            [(12, 1), (13, 2), (10, 3)], "neighbor_id long, rank int"
        )
        out = {r["doc_id"]: r for r in
               hybrid_rrf(bm, cos, k=60, top_n=10).collect()}

        b_ranks = {10: 1, 11: 2, 12: 3}
        c_ranks = {12: 1, 13: 2, 10: 3}
        expect = {}
        for d in set(b_ranks) | set(c_ranks):
            expect[d] = (1_000_000 // (60 + b_ranks[d]) if d in b_ranks
                         else 0) + (1_000_000 // (60 + c_ranks[d])
                                    if d in c_ranks else 0)
        assert {d: r["rrf_micro"] for d, r in out.items()} == expect
        # both-list docs outrank single-list docs here
        order = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))
        for i, (d, _) in enumerate(order, 1):
            assert out[d]["rank"] == i
        # missing-side ranks report 0
        assert out[11]["cos_rank"] == 0 and out[13]["bm25_rank"] == 0

    def test_tie_break_by_doc_id(self, spark):
        from adtech_log_data_pipeline_spark.functions.retrieval import (
            hybrid_rrf,
        )

        bm = spark.createDataFrame([(5, 1), (3, 2)], "doc_id long, rank int")
        cos = spark.createDataFrame(
            [(3, 1), (5, 2)], "neighbor_id long, rank int"
        )
        rows = hybrid_rrf(bm, cos).collect()
        # symmetric ranks -> equal scores -> doc 3 wins the tie
        assert [r["doc_id"] for r in rows] == [3, 5]


class TestMmrRerank:
    def test_pure_python_greedy_replay(self, spark):
        """Replay the greedy MMR loop in pure Python on a hand fixture
        with a redundant pair: the near-duplicate of pick 1 must be
        deferred in favor of a diverse doc."""
        from adtech_log_data_pipeline_spark.functions.retrieval import (
            mmr_rerank,
        )

        rel = {1: 900_000, 2: 850_000, 3: 500_000, 4: 480_000}
        sim = {
            (1, 2): 999_000, (2, 1): 999_000,  # near-dups
            (1, 3): 100_000, (3, 1): 100_000,
            (1, 4): 50_000, (4, 1): 50_000,
            (2, 3): 120_000, (3, 2): 120_000,
            (2, 4): 60_000, (4, 2): 60_000,
            (3, 4): 70_000, (4, 3): 70_000,
        }
        cand = spark.createDataFrame(
            [(d, r) for d, r in rel.items()], "doc_id long, rel_micro long"
        )
        sims = spark.createDataFrame(
            [(a, b, s) for (a, b), s in sim.items()],
            "id_a long, id_b long, sim_micro long",
        )
        got = [
            (r["pick"], r["doc_id"], r["max_sim_micro"], r["mmr_score"])
            for r in sorted(
                mmr_rerank(cand, sims, picks=4).collect(),
                key=lambda r: r["pick"],
            )
        ]

        chosen, expect = [], []
        remaining = set(rel)
        for pick in range(1, 5):
            best = None
            for d in sorted(remaining):
                ms = max((sim[(c, d)] for c in chosen), default=0)
                score = 7 * rel[d] - 3 * ms
                if best is None or score > best[1]:
                    best = (d, score, ms)
            d, score, ms = best
            expect.append((pick, d, ms, score))
            chosen.append(d)
            remaining.discard(d)
        assert got == expect
        # the redundancy penalty must actually defer the near-dup: doc 2
        # (rel #2) is NOT pick 2
        assert got[1][1] != 2

    def test_lambda_ten_is_pure_relevance(self, spark):
        """lambda = 1.0 degenerates to the relevance ranking."""
        from adtech_log_data_pipeline_spark.functions.retrieval import (
            mmr_rerank,
        )

        cand = spark.createDataFrame(
            [(1, 300), (2, 200), (3, 100)], "doc_id long, rel_micro long"
        )
        sims = spark.createDataFrame(
            [(a, b, 999_999) for a in (1, 2, 3) for b in (1, 2, 3)
             if a != b],
            "id_a long, id_b long, sim_micro long",
        )
        rows = mmr_rerank(cand, sims, picks=3, lambda_tenths=10).collect()
        assert [r["doc_id"] for r in
                sorted(rows, key=lambda r: r["pick"])] == [1, 2, 3]


class TestJoinCardinalityAudit:
    def test_pure_python_estimator_replay(self, spark):
        """Replay histogram + residual arithmetic in pure Python on a
        skewed fixture small enough that h=3 forces real residuals."""
        from adtech_log_data_pipeline_spark.functions.profile import (
            join_cardinality_audit,
        )

        a = [1] * 10 + [2] * 5 + [3] * 2 + [4, 5, 6]
        b = [1] * 4 + [3] * 6 + [5] * 2 + [7, 8]
        dfa = spark.createDataFrame([(k,) for k in a], "k long")
        dfb = spark.createDataFrame([(k,) for k in b], "k long")
        row = join_cardinality_audit(dfa, dfb, h=3).collect()[0]

        from collections import Counter

        ca, cb = Counter(a), Counter(b)
        true = sum(ca[k] * cb[k] for k in set(ca) & set(cb))
        hha = dict(sorted(ca.items(), key=lambda kv: (-kv[1], kv[0]))[:3])
        hhb = dict(sorted(cb.items(), key=lambda kv: (-kv[1], kv[0]))[:3])
        ra_rows = sum(ca.values()) - sum(hha.values())
        ra_d = len(ca) - len(hha)
        rb_rows = sum(cb.values()) - sum(hhb.values())
        rb_d = len(cb) - len(hhb)
        est = sum(hha[k] * hhb[k] for k in set(hha) & set(hhb))
        est += sum(c for k, c in hha.items() if k not in hhb) * (
            rb_rows // rb_d if rb_d else 0
        )
        est += sum(c for k, c in hhb.items() if k not in hha) * (
            ra_rows // ra_d if ra_d else 0
        )
        if max(ra_d, rb_d) > 0:
            est += (ra_rows * rb_rows) // max(ra_d, rb_d)
        assert row["n_a"] == len(a) and row["n_b"] == len(b)
        assert row["true_pairs"] == true
        assert row["est_pairs"] == est
        assert row["err_ppm"] == abs(est - true) * 1_000_000 // true

    def test_all_heavy_is_exact(self, spark):
        """When h covers every key the estimator IS the exact join size."""
        from adtech_log_data_pipeline_spark.functions.profile import (
            join_cardinality_audit,
        )

        dfa = spark.createDataFrame([(1,), (1,), (2,)], "k long")
        dfb = spark.createDataFrame([(1,), (2,), (2,)], "k long")
        row = join_cardinality_audit(dfa, dfb, h=10).collect()[0]
        assert row["est_pairs"] == row["true_pairs"] == 2 * 1 + 1 * 2
        assert row["err_ppm"] == 0


class TestTrimmedStats:
    def test_pure_python_replay(self, spark):
        """Exact percentile picks, winsorized and trimmed means recomputed
        in pure Python on a fixture with fat outliers."""
        import math

        from adtech_log_data_pipeline_spark.functions.profile import (
            trimmed_stats,
        )

        cents = [100] * 50 + [200] * 40 + [5] * 5 + [999_999] * 5
        df = spark.createDataFrame([(c,) for c in cents], "cents long")
        row = trimmed_stats(df, trim_pct=5).collect()[0]

        s = sorted(cents)
        n = len(s)
        r_lo, r_hi = math.ceil(5 * n / 100), math.ceil(95 * n / 100)
        p_lo, p_hi = s[r_lo - 1], s[r_hi - 1]
        wins = [min(max(c, p_lo), p_hi) for c in s]
        trim = [c for c in s if p_lo <= c <= p_hi]
        assert row["n_rows"] == n
        assert row["p_lo_cents"] == p_lo and row["p_hi_cents"] == p_hi
        assert row["mean_cents"] == sum(s) // n
        assert row["winsor_mean_cents"] == sum(wins) // n
        assert row["trimmed_mean_cents"] == sum(trim) // len(trim)
        assert row["n_below"] == sum(1 for c in s if c < p_lo)
        assert row["n_above"] == sum(1 for c in s if c > p_hi)
        # robustness: the trimmed mean ignores the 999999 outliers
        assert row["trimmed_mean_cents"] < row["mean_cents"]


class TestBm25Prf:
    def test_zero_expansion_equals_base_bm25(self, spark):
        """fb_terms=0 degenerates to plain bm25_topk — the two tf paths
        (isin literal vs broadcast term join) must agree exactly."""
        from adtech_log_data_pipeline_spark.functions.text import (
            bm25_prf_search,
            bm25_topk,
        )

        texts = [
            "spark join query window stream extra words here",
            "join join join stream other text",
            "window query spark spark",
            "unrelated tokens only",
            "stream window stream join",
        ]
        docs = _docs(spark, [(i, t, "en", "s", len(t))
                             for i, t in enumerate(texts)])
        base = [(r["doc_id"], r["n_hits"], r["score"], r["rank"])
                for r in bm25_topk(docs, k=5).collect()]
        prf = [(r["doc_id"], r["n_hits"], r["score"], r["rank"])
               for r in bm25_prf_search(docs, k=5, fb_terms=0).collect()]
        assert sorted(base) == sorted(prf)

    def test_expansion_pulls_in_cooccurring_docs(self, spark):
        """A doc with NO base query terms but rich in the feedback set's
        dominant co-occurring term must enter the expanded ranking."""
        from adtech_log_data_pipeline_spark.functions.text import (
            bm25_prf_search,
            bm25_topk,
        )

        texts = [
            "spark join catalyst catalyst catalyst",
            "spark query catalyst catalyst",
            "join window catalyst",
            "catalyst catalyst catalyst catalyst",  # no base terms
            "nothing relevant at all",
        ]
        docs = _docs(spark, [(i, t, "en", "s", len(t))
                             for i, t in enumerate(texts)])
        base_ids = {r["doc_id"] for r in bm25_topk(docs, k=5).collect()}
        prf_ids = {r["doc_id"]
                   for r in bm25_prf_search(
                       docs, k=5, fb_docs=3, fb_terms=1
                   ).collect()}
        assert 3 not in base_ids
        assert 3 in prf_ids


class TestTrainingNegatives:
    def test_pure_python_replay_and_laws(self, spark):
        """Replay hash selection in pure Python; negatives never collide
        with positives; counts are exact; choice is reshuffle-proof."""
        from adtech_log_data_pipeline_spark.functions.select import (
            training_negatives,
        )

        pos_pairs = [(1, 10), (1, 11), (2, 10), (3, 12)]
        cat = [10, 11, 12, 13, 14]
        pos = spark.createDataFrame(pos_pairs, "user_id long, part long")
        catalog = spark.createDataFrame([(p,) for p in cat], "part long")
        out = training_negatives(pos, catalog, k=2).collect()

        got = {}
        for r in out:
            got.setdefault(r["user_id"], []).append((r["rnk"], r["part"]))
        pos_set = set(pos_pairs)
        for u, pairs in got.items():
            for _, p in pairs:
                assert (u, p) not in pos_set

        def h(u, p):
            return int(
                hashlib.md5(f"{u}:{p}".encode()).hexdigest()[:8], 16
            )

        for u in (1, 2, 3):
            candidates = [p for p in cat if (u, p) not in pos_set]
            expect = sorted(candidates, key=lambda p: (h(u, p), p))[:2]
            assert [p for _, p in sorted(got[u])] == expect

    def test_repartition_does_not_change_choice(self, spark):
        from adtech_log_data_pipeline_spark.functions.select import (
            training_negatives,
        )

        pos = spark.createDataFrame(
            [(u, 10) for u in range(20)], "user_id long, part long"
        )
        catalog = spark.createDataFrame(
            [(p,) for p in range(10, 30)], "part long"
        )
        a = {(r["user_id"], r["rnk"]): r["part"]
             for r in training_negatives(pos, catalog).collect()}
        b = {(r["user_id"], r["rnk"]): r["part"]
             for r in training_negatives(
                 pos.repartition(7), catalog.repartition(3)
             ).collect()}
        assert a == b


class TestTargetEncodeLoo:
    def test_pure_python_replay(self, spark):
        """Replay the LOO smoothing formula by hand; a row's own label
        must not contribute to its encoding."""
        from adtech_log_data_pipeline_spark.functions.select import (
            target_encode_loo,
        )

        data = [(1, "a", 1), (2, "a", 0), (3, "a", 1),
                (4, "b", 0), (5, "b", 0)]
        rows = spark.createDataFrame(
            data, "row_id long, category string, y int"
        )
        out = {r["row_id"]: r["enc_ppm"]
               for r in target_encode_loo(rows, m=20,
                                          prior_ppm=500_000).collect()}
        from collections import defaultdict

        sums = defaultdict(int)
        ns = defaultdict(int)
        for _, c, y in data:
            sums[c] += y
            ns[c] += 1
        for rid, c, y in data:
            expect = ((sums[c] - y) * 1_000_000 + 500_000 * 20) // (
                ns[c] - 1 + 20
            )
            assert out[rid] == expect
        # leakage-safety: two same-category rows with different labels
        # get DIFFERENT encodings (the own label is excluded)
        assert out[1] != out[2]

    def test_singleton_category_falls_back_to_prior(self, spark):
        """n=1: the other-rows mean is empty, so the encoding is pulled
        entirely to the smoothed prior."""
        from adtech_log_data_pipeline_spark.functions.select import (
            target_encode_loo,
        )

        rows = spark.createDataFrame(
            [(1, "solo", 1)], "row_id long, category string, y int"
        )
        out = target_encode_loo(rows, m=20, prior_ppm=500_000).collect()[0]
        assert out["enc_ppm"] == (0 * 1_000_000 + 500_000 * 20) // 20
