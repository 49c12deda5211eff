"""Round-10 operators: hashed-feature linear quality classifier —
hand-computed laws and a pure-Python replay, not snapshots."""

import hashlib

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def _bucket(tok: str, n: int = 512) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n


def _bitlen(x: int) -> int:
    return x.bit_length()


class TestQualityClassifier:
    def test_pure_python_replay(self, spark):
        """Recompute bucket counts, weights and margins in plain Python on
        a small corpus; every document's (n_tokens, margin, pred) must
        match exactly."""
        from adtech_log_data_pipeline_spark.functions.select import (
            quality_classifier,
        )

        rows = [
            (1, "en", "the quick brown fox"),
            (2, "en", "the lazy dog sleeps"),
            (3, "de", "der schnelle braune fuchs"),
            (4, "de", "the dog der fuchs"),
            (5, "fr", "  le renard  rapide "),
        ]
        toks = []
        for doc_id, lang, text in rows:
            for tok in text.strip().lower().split():
                toks.append((doc_id, lang, _bucket(tok)))
        c_pos, c_neg = {}, {}
        for _, lang, b in toks:
            if lang == "en":
                c_pos[b] = c_pos.get(b, 0) + 1
            else:
                c_neg[b] = c_neg.get(b, 0) + 1
        buckets = set(c_pos) | set(c_neg)
        wt = {
            b: _bitlen(c_pos.get(b, 0) + 1) - _bitlen(c_neg.get(b, 0) + 1)
            for b in buckets
        }
        want = {}
        for doc_id, lang, _ in rows:
            mine = [b for d, _, b in toks if d == doc_id]
            margin = sum(wt[b] for b in mine)
            want[doc_id] = (len(mine), margin, 1 if margin > 0 else 0)

        got = {
            r["doc_id"]: (r["n_tokens"], r["margin"], r["pred"])
            for r in quality_classifier(_docs(spark, rows)).collect()
        }
        assert got == want
        # sanity on the fixture itself: both classes actually occur
        assert {v[2] for v in got.values()} == {0, 1}

    def test_weight_relation_is_bucket_bounded(self, spark):
        """However large the vocabulary, the learned model has at most
        n_buckets rows — the property that keeps it broadcastable at any
        corpus size."""
        from adtech_log_data_pipeline_spark.functions.select import (
            quality_classifier,
        )

        rows = [
            (i, "en" if i % 2 == 0 else "xx", " ".join(f"w{i}_{j}" for j in range(20)))
            for i in range(30)
        ]
        docs = _docs(spark, rows)
        out = quality_classifier(docs, n_buckets=16)
        assert out.count() == 30
        # distinct buckets actually used <= 16 even with 600 distinct tokens
        used = (
            docs.select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok"))
            .select(
                F.expr(
                    "cast(conv(substr(md5(tok), 1, 8), 16, 10) as bigint) % 16"
                ).alias("b")
            )
            .distinct()
            .count()
        )
        assert used <= 16

    def test_repartition_invariance(self, spark):
        """Margins are pure functions of content — reshuffling the corpus
        never changes a single classification."""
        from adtech_log_data_pipeline_spark.functions.select import (
            quality_classifier,
        )

        rows = [
            (i, ["en", "de", "fr"][i % 3], f"alpha beta w{i} gamma")
            for i in range(40)
        ]
        docs = _docs(spark, rows)
        a = {
            r["doc_id"]: (r["margin"], r["pred"])
            for r in quality_classifier(docs).collect()
        }
        b = {
            r["doc_id"]: (r["margin"], r["pred"])
            for r in quality_classifier(docs.repartition(13, "lang")).collect()
        }
        assert a == b


class TestPrCurveExact:
    def test_pure_python_replay(self, spark):
        """Hand-computed confusion at every distinct threshold, including
        tied scores across both classes; bucket_width=2 forces the
        two-phase scan across many buckets."""
        from adtech_log_data_pipeline_spark.functions.evaluate import (
            pr_curve_exact,
        )

        rows = [  # (score, label)
            (10, 1), (10, 0), (7, 1), (5, 0), (5, 1), (5, 1), (3, 0),
            (-2, 1), (-2, 0), (-9, 0),
        ]
        df = spark.createDataFrame(rows, "score long, label long")
        p_total = sum(l for _, l in rows)
        want = {}
        for t in sorted({s for s, _ in rows}, reverse=True):
            tp = sum(1 for s, l in rows if s >= t and l == 1)
            fp = sum(1 for s, l in rows if s >= t and l == 0)
            prec = (1_000_000 * tp) // (tp + fp)
            rec = (1_000_000 * tp) // p_total
            f1 = (2 * prec * rec) // (prec + rec) if prec + rec else -1
            want[t] = (tp, fp, p_total - tp, prec, rec, f1)
        got = {
            r["threshold"]: (
                r["tp"], r["fp"], r["fn"], r["precision_ppm"],
                r["recall_ppm"], r["f1_ppm"],
            )
            for r in pr_curve_exact(df, bucket_width=2).collect()
        }
        assert got == want

    def test_no_positives_sentinel(self, spark):
        from adtech_log_data_pipeline_spark.functions.evaluate import (
            pr_curve_exact,
        )

        df = spark.createDataFrame(
            [(4, 0), (1, 0), (1, 0)], "score long, label long"
        )
        out = pr_curve_exact(df).collect()
        assert {r["recall_ppm"] for r in out} == {-1}
        assert {r["f1_ppm"] for r in out} == {-1}
        assert {r["precision_ppm"] for r in out} == {0}
        assert all(r["fn"] == 0 for r in out)

    def test_monotone_laws(self, spark):
        """tp and fp are non-increasing in the threshold; recall is
        non-increasing; the lowest threshold classifies everything
        positive (recall = 1e6)."""
        from adtech_log_data_pipeline_spark.functions.evaluate import (
            pr_curve_exact,
        )

        rows = [(i % 17 - 5, 1 if i % 3 == 0 else 0) for i in range(200)]
        df = spark.createDataFrame(rows, "score long, label long")
        out = sorted(
            pr_curve_exact(df, bucket_width=3).collect(),
            key=lambda r: -r["threshold"],
        )
        for a, b in zip(out, out[1:]):
            assert b["tp"] >= a["tp"] and b["fp"] >= a["fp"]
            assert b["recall_ppm"] >= a["recall_ppm"]
        assert out[-1]["recall_ppm"] == 1_000_000
        assert out[-1]["tp"] + out[-1]["fp"] == 200


class TestClusterBalancedSample:
    def _emb(self, spark):
        import math

        # two tight, well-separated blobs of unequal size (60 vs 6): a
        # uniform sample would be ~10:1; the balanced sample must not be
        rows = [
            (i, [10.0 + math.sin(i) * 0.01, 10.0 + math.cos(i) * 0.01])
            for i in range(60)
        ] + [
            (100 + i, [-10.0 + i * 0.01, -10.0]) for i in range(6)
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_quota_and_balance(self, spark):
        from adtech_log_data_pipeline_spark.functions.similarity import (
            cluster_balanced_sample,
        )

        out = cluster_balanced_sample(
            self._emb(spark), per_cluster=4, k=2, total=66
        ).collect()
        by_cid = {}
        for r in out:
            by_cid.setdefault(r["cid"], []).append(r)
        # both clusters present, each contributing EXACTLY the quota
        assert sorted(len(v) for v in by_cid.values()) == [4, 4]
        for rows in by_cid.values():
            assert sorted(r["rnk"] for r in rows) == [1, 2, 3, 4]
        # the dense blob did not crowd out the sparse one
        small = [r for r in out if r["vec_id"] >= 100]
        assert len(small) == 4

    def test_deterministic_and_repartition_invariant(self, spark):
        from adtech_log_data_pipeline_spark.functions.similarity import (
            cluster_balanced_sample,
        )

        emb = self._emb(spark)
        a = sorted(
            (r["vec_id"], r["cid"], r["rnk"])
            for r in cluster_balanced_sample(emb, per_cluster=3, k=2, total=66).collect()
        )
        b = sorted(
            (r["vec_id"], r["cid"], r["rnk"])
            for r in cluster_balanced_sample(
                emb.repartition(7), per_cluster=3, k=2, total=66
            ).collect()
        )
        assert a == b and len(a) == 6

    def test_small_cluster_keeps_all_members(self, spark):
        from adtech_log_data_pipeline_spark.functions.similarity import (
            cluster_balanced_sample,
        )

        out = cluster_balanced_sample(
            self._emb(spark), per_cluster=10, k=2, total=66
        ).collect()
        # the 6-member blob contributes all 6 (quota exceeds its size)
        small = [r for r in out if r["vec_id"] >= 100]
        assert len(small) == 6
