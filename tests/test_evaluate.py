"""Evaluation operators (functions/evaluate.py) + k-hop BFS
(functions/graph.py::khop_reachability): laws against transparent
pure-Python references, never snapshots."""

import random

from pyspark.sql import functions as F


def _scored(spark, rows):
    return spark.createDataFrame(
        rows, "uid long, score long, label int"
    )


def _py_auc_2u(rows):
    """Quadratic reference: sum over (pos, neg) pairs of 2*win + tie."""
    pos = [s for _, s, l in rows if l == 1]
    neg = [s for _, s, l in rows if l == 0]
    return sum(
        2 * (p > n) + (p == n) for p in pos for n in neg
    ), len(pos), len(neg)


class TestAucExact:
    def test_perfect_ranking(self, spark):
        from adtech_log_data_pipeline_spark.functions.evaluate import auc_exact

        rows = [(1, 10, 0), (2, 20, 0), (3, 30, 1), (4, 40, 1)]
        r = auc_exact(_scored(spark, rows)).collect()[0]
        assert (r["n_pos"], r["n_neg"]) == (2, 2)
        assert r["auc_2u"] == 2 * 2 * 2  # every pair correctly ordered
        assert r["auc_micro"] == 1_000_000

    def test_all_tied_is_half(self, spark):
        from adtech_log_data_pipeline_spark.functions.evaluate import auc_exact

        rows = [(i, 7, i % 2) for i in range(6)]
        r = auc_exact(_scored(spark, rows)).collect()[0]
        assert r["auc_micro"] == 500_000

    def test_degenerate_labels_sentinel(self, spark):
        from adtech_log_data_pipeline_spark.functions.evaluate import auc_exact

        r = auc_exact(_scored(spark, [(1, 5, 1), (2, 9, 1)])).collect()[0]
        assert r["n_neg"] == 0 and r["auc_micro"] == -1

    def test_fuzz_vs_quadratic_reference(self, spark):
        """Random scores with heavy ties, tiny bucket width so the
        two-phase scan crosses many bucket boundaries."""
        from adtech_log_data_pipeline_spark.functions.evaluate import auc_exact

        rng = random.Random(7)
        for trial in range(3):
            rows = [
                (i, rng.randrange(0, 25), rng.randrange(0, 2))
                for i in range(120)
            ]
            want_2u, n_pos, n_neg = _py_auc_2u(rows)
            r = auc_exact(
                _scored(spark, rows), bucket_width=4
            ).collect()[0]
            assert (r["n_pos"], r["n_neg"]) == (n_pos, n_neg)
            assert r["auc_2u"] == want_2u
            assert r["auc_micro"] == (1_000_000 * want_2u) // (
                2 * n_pos * n_neg
            )


class TestCalibrationBins:
    def test_matches_sql_ntile(self, spark):
        """The distributed closed-form split must equal Spark's own
        ntile() window over (score, uid) — including the uneven case
        n % bins != 0."""
        from adtech_log_data_pipeline_spark.functions.evaluate import (
            calibration_bins,
        )
        from pyspark.sql.window import Window

        rng = random.Random(11)
        for n in (7, 23, 40, 101):  # n < bins, uneven, even, prime
            rows = [
                (i, rng.randrange(0, 9), rng.randrange(0, 2))
                for i in range(n)
            ]
            df = _scored(spark, rows)
            got = {
                r["bin"]: r
                for r in calibration_bins(
                    df, n_bins=10, bucket_width=3
                ).collect()
            }
            want = (
                df.withColumn(
                    "bin",
                    F.ntile(10).over(Window.orderBy("score", "uid")),
                )
                .groupBy("bin")
                .agg(
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum("label").alias("n_pos"),
                    F.min("score").alias("lo_score"),
                    F.max("score").alias("hi_score"),
                )
                .collect()
            )
            assert len(got) == len(want) == min(n, 10)
            for w in want:
                g = got[w["bin"]]
                assert g["n_rows"] == w["n_rows"]
                assert g["n_pos"] == w["n_pos"]
                assert g["lo_score"] == w["lo_score"]
                assert g["hi_score"] == w["hi_score"]
                assert g["pos_rate_micro"] == (
                    1_000_000 * w["n_pos"]
                ) // w["n_rows"]


class TestKhopReachability:
    def test_matches_python_bfs(self, spark):
        from adtech_log_data_pipeline_spark.functions.graph import (
            khop_reachability,
        )

        rng = random.Random(3)
        edges = set()
        while len(edges) < 60:
            a, b = rng.randrange(0, 40), rng.randrange(0, 40)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        pairs = spark.createDataFrame(
            [(a, b, 1) for a, b in sorted(edges)], "p1 long, p2 long, w long"
        )
        got = {
            r["node"]: r["hops"]
            for r in khop_reachability(pairs, seed_mod=10, k=3).collect()
        }
        # pure-Python BFS
        adj = {}
        nodes = set()
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
            nodes |= {a, b}
        dist = {n: 0 for n in nodes if n % 10 == 0}
        frontier = set(dist)
        for h in range(1, 4):
            nxt = set()
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = h
                        nxt.add(v)
            frontier = nxt
        assert got == dist

    def test_seed_distance_zero_and_monotone(self, spark):
        from adtech_log_data_pipeline_spark.functions.graph import (
            khop_reachability,
        )

        pairs = spark.createDataFrame(
            [(0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 4, 1)],
            "p1 long, p2 long, w long",
        )
        got = {
            r["node"]: r["hops"]
            for r in khop_reachability(pairs, seed_mod=100, k=3).collect()
        }
        assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # 4 unreached within k=3


class TestKnnLabelAgreement:
    def test_pure_label_clusters_agree_fully(self, spark):
        """Two well-separated label clusters: every neighbor shares the
        query's label -> agreement_micro = 1e6 for both labels."""
        from adtech_log_data_pipeline_spark.functions.evaluate import (
            knn_label_agreement,
        )

        rng = random.Random(5)
        rows = []
        for i in range(8):
            rows.append((i, [10.0 + rng.random() for _ in range(4)], 0))
        for i in range(8, 16):
            rows.append((i, [-10.0 - rng.random() for _ in range(4)], 1))
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        )
        out = {r["label"]: r for r in knn_label_agreement(emb, k=5).collect()}
        assert out[0]["n_vecs"] == out[1]["n_vecs"] == 8
        assert out[0]["agreement_micro"] == 1_000_000
        assert out[1]["agreement_micro"] == 1_000_000


class TestSelfKnnTopk:
    def test_matches_brute_force_sql_path(self, spark):
        """The Arrow candidate + exact re-rank pipeline must reproduce
        brute_force_topk (the gate-proven SQL-expression path) exactly —
        heavy rounded-cosine ties included."""
        from adtech_log_data_pipeline_spark.functions.evaluate import (
            _self_knn_topk,
        )
        from adtech_log_data_pipeline_spark.functions.similarity import (
            brute_force_topk,
        )
        from pyspark.sql import functions as F

        rng = random.Random(17)
        # low-dim integer grid vectors force many exactly-tied cosines
        rows = [
            (i, [float(rng.randrange(0, 3)) for _ in range(4)])
            for i in range(60)
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        got = {
            (r["query_id"], r["rank"]): r["neighbor_id"]
            for r in _self_knn_topk(emb, 5).collect()
        }
        q = emb.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qvec"),
        )
        want = {
            (r["query_id"], r["rank"]): r["neighbor_id"]
            for r in brute_force_topk(emb, q, k=5).collect()
        }
        assert got == want

    def test_brute_cap_raises(self, spark):
        from adtech_log_data_pipeline_spark.functions import evaluate

        emb = spark.createDataFrame(
            [(0, [1.0]), (1, [2.0])], "vec_id long, embedding array<double>"
        )
        saved = evaluate.KNN_BRUTE_MAX
        evaluate.KNN_BRUTE_MAX = 1
        try:
            import pytest

            with pytest.raises(ValueError, match="O\\(n\\^2\\)"):
                evaluate._self_knn_topk(emb, 5).collect()
        finally:
            evaluate.KNN_BRUTE_MAX = saved


class TestBoundedShortestPath:
    def test_matches_python_bellman_ford(self, spark):
        """Random weighted graph vs a pure-Python bounded Bellman-Ford
        (min cost over paths of <= k edges from the seed set)."""
        from adtech_log_data_pipeline_spark.functions.graph import (
            bounded_shortest_path,
        )

        rng = random.Random(23)
        edges = {}
        while len(edges) < 70:
            a, b = rng.randrange(0, 40), rng.randrange(0, 40)
            if a != b:
                edges[(min(a, b), max(a, b))] = rng.randrange(1, 9)
        pairs = spark.createDataFrame(
            [(a, b, w) for (a, b), w in sorted(edges.items())],
            "p1 long, p2 long, w long",
        )
        got = {
            r["node"]: r["cost_micro"]
            for r in bounded_shortest_path(
                pairs, seed_mod=10, k=3
            ).collect()
        }
        adj = {}
        for (a, b), w in edges.items():
            ln = 1_000_000 // w
            adj.setdefault(a, []).append((b, ln))
            adj.setdefault(b, []).append((a, ln))
        dist = {n: 0 for n in adj if n % 10 == 0}
        best = dict(dist)
        frontier = dist
        for _ in range(3):
            nxt = {}
            for u, du in frontier.items():
                for v, ln in adj.get(u, ()):
                    c = du + ln
                    if c < nxt.get(v, 1 << 60):
                        nxt[v] = c
            for v, c in nxt.items():
                if c < best.get(v, 1 << 60):
                    best[v] = c
            frontier = nxt
        assert got == best

    def test_seed_cost_zero_shorter_via_heavier_edge(self, spark):
        """Path 0-1-2 over weight-5 edges (len 200000 each) must beat
        the direct weight-1 edge 0-2 (len 1000000)."""
        from adtech_log_data_pipeline_spark.functions.graph import (
            bounded_shortest_path,
        )

        pairs = spark.createDataFrame(
            [(0, 1, 5), (1, 2, 5), (0, 2, 1)], "p1 long, p2 long, w long"
        )
        got = {
            r["node"]: r["cost_micro"]
            for r in bounded_shortest_path(
                pairs, seed_mod=100, k=3
            ).collect()
        }
        assert got == {0: 0, 1: 200_000, 2: 400_000}


class TestZscoreAnomalyCells:
    def test_matches_float_zscore_reference(self, spark):
        """The denominator-free integer inequality must agree with the
        plain float z-score on strict-> threshold crossings."""
        from adtech_log_data_pipeline_spark.functions.evaluate import (
            zscore_anomaly_cells,
        )

        rng = random.Random(31)
        rows = []
        for g in ("a", "b", "c"):
            base = rng.randrange(50, 200)
            for h in range(40):
                x = base + rng.randrange(-5, 6)
                if h % 17 == 0:
                    x += base * 2  # planted spikes
                rows.append((g, h, x))
        df = spark.createDataFrame(rows, "event_type string, hour_bucket long, cents long")
        got = {
            (r["event_type"], r["hour_bucket"])
            for r in zscore_anomaly_cells(df, z=2).collect()
        }
        want = set()
        for g in ("a", "b", "c"):
            xs = [x for gg, _, x in rows if gg == g]
            n = len(xs); mu = sum(xs) / n
            var = sum((x - mu) ** 2 for x in xs) / n
            for gg, h, x in rows:
                if gg == g and (x - mu) ** 2 > 4 * var + 1e-9:
                    want.add((g, h))
        assert got == want

    def test_uniform_group_has_no_anomalies(self, spark):
        from adtech_log_data_pipeline_spark.functions.evaluate import (
            zscore_anomaly_cells,
        )

        df = spark.createDataFrame(
            [("a", h, 100) for h in range(20)],
            "event_type string, hour_bucket long, cents long",
        )
        assert zscore_anomaly_cells(df, z=2).count() == 0


class TestLoudContracts:
    """Round-8 advisor fixes: silent divergences became loud failures."""

    def test_ntile_null_value_raises(self, spark):
        """distributed_ntile's rank join would silently DROP a NULL value
        row (and plain ntile() NULL ordering is engine-dependent) — the
        non-null contract raises at execution instead."""
        import pytest

        from adtech_log_data_pipeline_spark.functions.evaluate import (
            distributed_ntile,
        )

        df = spark.createDataFrame(
            [(1, 10), (2, None), (3, 30)], "uid long, v long"
        )
        # the r13 LAZY hold (chain linearization) still defers the raise
        # to action time; the contract is "loud, never a silent drop",
        # so accept the raise from either construction or action
        with pytest.raises(Exception, match="non-null contract"):
            distributed_ntile(
                df, value_col="v", id_col="uid", n_bins=2
            ).collect()

    def test_ntile_non_null_unaffected_by_guard(self, spark):
        from adtech_log_data_pipeline_spark.functions.evaluate import (
            distributed_ntile,
        )

        df = spark.createDataFrame(
            [(i, i * 3 % 7) for i in range(20)], "uid long, v long"
        )
        got = {
            (r["uid"], r["bin"])
            for r in distributed_ntile(
                df, value_col="v", id_col="uid", n_bins=4
            ).collect()
        }
        want = {
            (r["uid"], r["b"])
            for r in df.selectExpr(
                "uid", "ntile(4) over (order by v, uid) as b"
            ).collect()
        }
        assert got == want

    def test_zscore_overflow_raises_like_hugeint(self, spark):
        """A decimal(38,0) overflow in the cleared z^2 inequality must
        raise (matching DuckDB's HUGEINT error), not silently filter the
        row out — under ANSI Spark the arithmetic itself errors; under
        the non-ANSI vanilla session the product silently NULLs and the
        engine-side guard must fire instead. Both paths are pinned."""
        import pytest

        from adtech_log_data_pipeline_spark.functions.evaluate import (
            zscore_anomaly_cells,
        )

        big = 3 * 10**18  # n * sum(cents^2) ~ 3e38 > 38 decimal digits
        df = spark.createDataFrame(
            [("a", 0, big), ("a", 1, -big), ("a", 2, 3 * big)],
            "event_type string, hour_bucket long, cents long",
        )
        prior = spark.conf.get("spark.sql.ansi.enabled")
        for ansi in ("true", "false"):
            spark.conf.set("spark.sql.ansi.enabled", ansi)
            try:
                with pytest.raises(
                    Exception, match="overflow|cannot be represented"
                ):
                    zscore_anomaly_cells(df, z=2).collect()
            finally:
                spark.conf.set("spark.sql.ansi.enabled", prior)

    def test_self_knn_excludes_self_on_zero_norm_corpus(self, spark):
        """Degenerate corpus (zero-norm vectors make every cosine NULL):
        the self pair must never appear in the top-k (advisor: the -inf
        kth-candidate path let it leak into stage 2)."""
        from adtech_log_data_pipeline_spark.functions.evaluate import (
            _self_knn_topk,
        )

        emb = spark.createDataFrame(
            [(i, [0.0, 0.0, 0.0]) for i in range(4)],
            "vec_id long, embedding array<double>",
        )
        rows = _self_knn_topk(emb, k=2).collect()
        assert all(r["query_id"] != r["neighbor_id"] for r in rows)
