"""Corpus-curation operators: stratified sampling, dedup representative
selection, benchmark-contamination screening (oracle-gated in
__spark_entry__; these tests pin the semantic contracts directly)."""

from __future__ import annotations

from pyspark.sql import functions as F

from adtech_log_data_pipeline_spark.functions.dedup import dedup_keep_best
from adtech_log_data_pipeline_spark.functions.text import (
    CONTAM_EVAL_MOD,
    contamination_check,
    stratified_sample,
)
from adtech_log_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF, "documents")


def test_stratified_sample_caps_each_source(spark):
    """Each source keeps about `target` docs (hash-threshold tolerance);
    sources at-or-under target keep everything."""
    target = 10
    docs = _docs(spark)
    kept = stratified_sample(docs, target_per_source=target)
    src_totals = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    kept_counts = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for src, total in src_totals.items():
        k = kept_counts.get(src, 0)
        if total <= target:
            assert k == total, f"{src}: small source must keep all docs"
        else:
            # hash-threshold sampling: expected ~target, binomial spread
            assert 0 < k <= total
            assert abs(k - target) <= max(6, total // 3)


def test_stratified_sample_membership_stable_under_corpus_growth(spark):
    """A document's membership depends only on its own hash and its OWN
    source's rate — when a different source grows, every unchanged
    source's kept set is identical (growth-/reshuffle-proof, unlike
    rand()). Simulated by shrinking one source and comparing the other
    sources' membership against the full-corpus sample."""
    docs = _docs(spark)
    grown_src = docs.select(F.min("source")).first()[0]
    # "before growth": the grown source had only its odd doc_ids
    before = docs.filter(
        (F.col("source") != grown_src) | (F.col("doc_id") % 2 == 1)
    )

    def kept_by_other_sources(d):
        return {
            (r["source"], r["doc_id"])
            for r in stratified_sample(d, 10)
            .filter(F.col("source") != grown_src)
            .collect()
        }

    assert kept_by_other_sources(before) == kept_by_other_sources(docs)
    # and the run itself is deterministic
    a = {r["doc_id"] for r in stratified_sample(docs, 10).collect()}
    b = {r["doc_id"] for r in stratified_sample(docs, 10).collect()}
    assert a == b


def test_dedup_keep_best_one_keeper_per_group(spark):
    out = dedup_keep_best(_docs(spark))
    per_group = out.groupBy("content_hash").agg(
        F.sum(F.col("keep").cast("int")).alias("n_keep"),
        F.count(F.lit(1)).alias("n"),
        F.max("group_size").alias("gs"),
    )
    rows = per_group.collect()
    assert all(r["n_keep"] == 1 for r in rows)
    assert all(r["n"] == r["gs"] for r in rows)
    # total rows = corpus size (policy labels every doc)
    assert out.count() == _docs(spark).count()


def test_dedup_keep_best_prefers_longest_then_smallest_id(spark):
    rows = [
        (1, "a  b"),   # len 4 — longest raw text of the group
        (2, "a b"),    # len 3
        (3, "a b"),    # len 3, larger id
        (4, "unique"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["keep"] for r in dedup_keep_best(df).collect()}
    assert out == {1: True, 2: False, 3: False, 4: True}


def test_curated_corpus_equals_operator_composition(spark):
    """The fused single-scan plan must produce exactly the intersection of
    its three standalone building blocks (each independently
    oracle-checked), with the split labels of train_split."""
    from adtech_log_data_pipeline_spark.functions.text import (
        curated_corpus,
        train_split,
    )

    docs = _docs(spark)
    fused = {
        (r["doc_id"], r["source"], r["split"]) for r in curated_corpus(docs).collect()
    }
    keep = {r["doc_id"] for r in dedup_keep_best(docs).collect() if r["keep"]}
    sampled = {r["doc_id"] for r in stratified_sample(docs).collect()}
    long_enough = {
        r["doc_id"]
        for r in docs.select(
            "doc_id", F.size(F.split(F.lower(F.trim("text")), r"\s+")).alias("n")
        ).collect()
        if r["n"] >= 20
    }
    splits = {r["doc_id"]: r["split"] for r in train_split(docs).collect()}
    sources = {r["doc_id"]: r["source"] for r in docs.select("doc_id", "source").collect()}
    expected = {
        (d, sources[d], splits[d]) for d in keep & sampled & long_enough
    }
    assert fused == expected


def test_export_training_shards_layout_and_manifest(spark, tmp_path):
    """The sink writes hive-partitioned split directories whose contents
    match the curated relation, and the manifest agrees with both."""
    import os

    from adtech_log_data_pipeline_spark.functions.export import (
        export_training_shards,
    )
    from adtech_log_data_pipeline_spark.functions.text import curated_corpus

    out = str(tmp_path / "export")
    docs = _docs(spark)
    manifest = {r["split"]: r for r in export_training_shards(docs, out).collect()}
    curated = curated_corpus(docs)
    expected = {
        r["split"]: (r["n"], r["toks"])
        for r in curated.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("toks"))
        .collect()
    }
    assert set(manifest) == set(expected)
    for split, (n, toks) in expected.items():
        assert manifest[split]["n_docs"] == n
        assert manifest[split]["n_tokens"] == toks
        assert os.path.isdir(os.path.join(out, "shards", f"split={split}"))

    back = spark.read.parquet(os.path.join(out, "shards"))
    assert back.count() == sum(n for n, _ in expected.values())
    # written rows carry the full document payload + curation columns
    assert {"doc_id", "text", "source", "split", "n_tokens"} <= set(back.columns)
    # shard contents are doc_id-sorted within each file (layout contract)
    import pyarrow.parquet as pq

    for split in expected:
        d = os.path.join(out, "shards", f"split={split}")
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                ids = pq.read_table(os.path.join(d, f), columns=["doc_id"])[
                    "doc_id"
                ].to_pylist()
                assert ids == sorted(ids)


def test_contamination_check_flags_eval_overlap(spark):
    """A train doc sharing a full shingle with an eval doc must be flagged
    with ratio 1; disjoint docs report 0."""
    ev_id = CONTAM_EVAL_MOD  # % CONTAM_EVAL_MOD == 0 -> eval side
    rows = [
        (ev_id, "alpha beta gamma delta"),
        (1, "alpha beta gamma delta"),  # fully contained in eval shingles
        (2, "totally different words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in contamination_check(df).collect()}
    assert set(out) == {1, 2}  # eval doc itself is excluded from output
    assert out[1]["n_contaminated"] == out[1]["n_shingles"]
    assert out[1]["contamination_r6"] == 1.0
    assert out[2]["n_contaminated"] == 0


def test_temperature_mix_upweights_small_sources(spark):
    """alpha=0.5: a source with 1/100 the token mass gets ~10x the keep
    RATE of the big source (sqrt reweighting), and the rate law is exact:
    rate = ceil(target_tokens * 1e6 / tok_src) with
    target ∝ sqrt-share."""
    import math

    from adtech_log_data_pipeline_spark.functions.text import temperature_mix

    rows = (
        # big: 100 docs x 100 tokens = 10_000 tokens
        [(i, " ".join(f"w{j}" for j in range(100)), "big") for i in range(100)]
        # small: 10 docs x 10 tokens = 100 tokens
        + [(1000 + i, " ".join(f"s{j}" for j in range(10)), "small") for i in range(10)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = temperature_mix(docs, budget_pct=10).collect()
    rates = {r["source"]: r["rate_ppm"] for r in out}
    assert set(rates) == {"big", "small"}
    # exact restatement of the integer formula
    q_big = math.floor(math.sqrt(10_000) * 1000 + 0.5)
    q_small = math.floor(math.sqrt(100) * 1000 + 0.5)
    s = q_big + q_small
    budget = 10_100 * 10 // 100
    exp_big = min(10**6, ((budget * q_big // s) * 10**6 + 10_000 - 1) // 10_000)
    exp_small = min(10**6, ((budget * q_small // s) * 10**6 + 100 - 1) // 100)
    assert rates["big"] == exp_big and rates["small"] == exp_small
    # the point of the temperature: small source rate ~10x the big one
    assert 8 < rates["small"] / rates["big"] < 12


def test_curation_funnel_monotone_and_reconciles_with_curated_corpus(spark):
    """Funnel laws: cumulative stages shrink monotonically, the splits
    partition the final stage exactly, and the terminal counts reconcile
    with curated_corpus's own survivor rows."""
    from adtech_log_data_pipeline_spark.functions.text import (
        curated_corpus,
        curation_funnel,
    )

    docs = _docs(spark)
    f = {r["stage"]: r for r in curation_funnel(docs).collect()}
    order = ["corpus", "dedup_keep_best", "quality_floor", "balanced_sample"]
    for a, b in zip(order, order[1:]):
        assert f[a]["n_docs"] >= f[b]["n_docs"]
        assert f[a]["n_tokens"] >= f[b]["n_tokens"]
    splits = ["split_train", "split_val", "split_test"]
    assert f["balanced_sample"]["n_docs"] == sum(f[s]["n_docs"] for s in splits)
    assert f["balanced_sample"]["n_tokens"] == sum(
        f[s]["n_tokens"] for s in splits
    )
    survivors = curated_corpus(docs).collect()
    assert f["balanced_sample"]["n_docs"] == len(survivors)
    assert f["balanced_sample"]["n_tokens"] == sum(
        r["n_tokens"] for r in survivors
    )
    per_split = {}
    for r in survivors:
        per_split[r["split"]] = per_split.get(r["split"], 0) + 1
    assert f["split_train"]["n_docs"] == per_split.get("train", 0)
    assert f["split_val"]["n_docs"] == per_split.get("val", 0)
    assert f["split_test"]["n_docs"] == per_split.get("test", 0)


def test_exact_stratified_sample_quota_and_window_group_limit(spark):
    """Exact-quota law: exactly min(k, n_source) picks per source with
    ranks 1..k; the physical plan carries the WindowGroupLimit rewrite
    (per-partition top-k BEFORE the exchange — the property that keeps
    the shuffle k-bounded at 100 TB)."""
    from adtech_log_data_pipeline_spark.functions.text import (
        exact_stratified_sample,
    )

    docs = _docs(spark)
    out = exact_stratified_sample(docs, k_per_source=15)
    rows = out.collect()
    per_src = {}
    for r in rows:
        per_src.setdefault(r["source"], []).append(r["pick_rank"])
    src_sizes = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for src, ranks in per_src.items():
        want = min(15, src_sizes[src])
        assert sorted(ranks) == list(range(1, want + 1))
    assert set(per_src) == set(src_sizes)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
