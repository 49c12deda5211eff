"""Crash-atomicity laws for manifest-committed index artifacts
(functions/_index_commit.py — round-12 verdict #1): a kill between an
append's relation writes must leave the OLD index version readable and
the torn batch dirs refused, a later successful append must sweep the
orphans, and the stored build parameters must gate every consumer
(round-12 ADVICE: meta validation + vec_id-overlap fail-fast)."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from adtech_log_data_pipeline_spark.functions import _index_commit

DIMS, M, K = 8, 4, 4


def _vecs(n=24, dims=DIMS, seed=11):
    rng = np.random.default_rng(seed)
    return [(i, [float(x) for x in rng.normal(size=dims)]) for i in range(n)]


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _committed_batches(index_dir):
    """Every on-disk relation/b=N pair, for orphan-sweep assertions."""
    out = []
    for rel in sorted(os.listdir(index_dir)):
        p = os.path.join(index_dir, rel)
        if rel.startswith("_") or not os.path.isdir(p):
            continue
        for b in sorted(os.listdir(p)):
            out.append(f"{rel}/{b}")
    return out


class _CrashAfter:
    """Test seam: delegate to the real _write_relation for the first
    ``n_ok`` writes, then crash — the kill-between-writes simulation."""

    def __init__(self, n_ok, real):
        self.n_ok, self.real, self.calls = n_ok, real, 0

    def __call__(self, df, path):
        self.calls += 1
        if self.calls > self.n_ok:
            raise RuntimeError("simulated crash between relation writes")
        self.real(df, path)


def test_pq_append_crash_between_writes_keeps_old_version(
    spark, tmp_path, monkeypatch
):
    """Crash after the codes write but before ivf_assign: the manifest
    still names only the build's batches, so the loaded index equals
    the pre-append artifact bit-for-bit (no coded-but-unassigned
    state); the next successful append sweeps the orphan and commits
    both increments together."""
    from adtech_log_data_pipeline_spark.functions.similarity import (
        append_pq_index,
        build_pq_index,
        ivf_assignments,
        load_pq_index,
        pq_code_rows,
    )

    rows = _vecs(n=40, seed=7)
    existing = _df(spark, [r for r in rows if r[0] % 4 != 3])
    incoming = _df(spark, [r for r in rows if r[0] % 4 == 3])
    idx_dir = str(tmp_path / "pq")
    build_pq_index(existing, idx_dir, m=M, n_codes=K, n_lists=4)
    pre = load_pq_index(spark, idx_dir)
    pre_codes, pre_assign = _rows(pre.codes), _rows(pre.assign)

    real = _index_commit._write_relation
    crash = _CrashAfter(1, real)
    monkeypatch.setattr(_index_commit, "_write_relation", crash)
    with pytest.raises(RuntimeError, match="simulated crash"):
        append_pq_index(incoming, idx_dir)
    assert crash.calls == 2  # codes landed, ivf_assign crashed

    # torn batch dir is on disk but REFUSED: the load equals pre-append
    assert "codes/b=2" in _committed_batches(idx_dir)
    mid = load_pq_index(spark, idx_dir)
    assert _rows(mid.codes) == pre_codes
    assert _rows(mid.assign) == pre_assign
    assert mid.meta["n_vectors"] == pre.meta["n_vectors"]

    # recovery: the real append sweeps the orphan and commits cleanly
    monkeypatch.setattr(_index_commit, "_write_relation", real)
    append_pq_index(incoming, idx_dir)
    post = load_pq_index(spark, idx_dir)
    full = _df(spark, rows)
    assert _rows(post.codes) == _rows(
        pq_code_rows(full, m=M, codebook=post.codebook)
    )
    assert _rows(post.assign) == _rows(
        ivf_assignments(full, seeds=post.ivf_seeds)
    )
    # no on-disk batch dir escapes the manifest
    man = _index_commit.read_index_manifest(idx_dir)
    committed = {
        f"{rel}/b={v}"
        for rel, vs in man["relations"].items()
        for v in vs
    }
    assert set(_committed_batches(idx_dir)) == committed


def test_pq_append_overlap_fails_fast(spark, tmp_path):
    """An overlapping batch would duplicate code rows and silently
    double summed adc_score — the append must refuse it and leave the
    index untouched (round-12 ADVICE)."""
    from adtech_log_data_pipeline_spark.functions.similarity import (
        append_pq_index,
        build_pq_index,
        load_pq_index,
    )

    rows = _vecs(n=24, seed=5)
    idx_dir = str(tmp_path / "pq")
    build_pq_index(_df(spark, rows), idx_dir, m=M, n_codes=K, n_lists=4)
    with pytest.raises(ValueError, match="already indexed"):
        append_pq_index(_df(spark, rows[:4]), idx_dir)
    man = _index_commit.read_index_manifest(idx_dir)
    assert man["version"] == 1 and man["meta"]["n_vectors"] == 24


def test_pq_param_mismatch_raises_and_defaults_resolve(spark, tmp_path):
    """The manifest stores (m, n_codes, n_lists, dims, n_vectors); a
    consumer passing a DIFFERENT m/n_codes than the build fails loudly
    instead of mis-slicing sub boundaries, and a consumer passing none
    inherits the index's own parameters (the FAISS contract)."""
    from adtech_log_data_pipeline_spark.functions.similarity import (
        append_pq_index,
        build_pq_index,
        ivfpq_topk,
        load_pq_index,
        pq_adc_topk,
    )

    rows = _vecs(n=24, seed=3)
    emb = _df(spark, rows)
    q = spark.createDataFrame(
        [(i, v) for i, v in rows[:2]], "query_id long, qvec array<float>"
    )
    idx_dir = str(tmp_path / "pq")
    build_pq_index(emb, idx_dir, m=M, n_codes=K, n_lists=4)
    idx = load_pq_index(spark, idx_dir)
    assert idx.meta == {
        "m": M, "n_codes": K, "n_lists": 4, "dims": DIMS, "n_vectors": 24
    }
    with pytest.raises(ValueError, match="built with m="):
        pq_adc_topk(emb, q, k=3, m=2, index=idx)
    with pytest.raises(ValueError, match="built with n_codes="):
        ivfpq_topk(emb, q, k=3, m=M, n_codes=32, index=idx)
    with pytest.raises(ValueError, match="built with m="):
        append_pq_index(_df(spark, [(100, rows[0][1])]), idx_dir, m=8)
    # omitted params resolve from the manifest: equal to explicit ones
    a = pq_adc_topk(emb, q, k=3, index=idx).collect()
    b = pq_adc_topk(emb, q, k=3, m=M, n_codes=K, index=idx).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)) and len(a) > 0


def test_pq_append_updates_n_vectors(spark, tmp_path):
    from adtech_log_data_pipeline_spark.functions.similarity import (
        append_pq_index,
        build_pq_index,
        load_pq_index,
    )

    rows = _vecs(n=30, seed=9)
    idx_dir = str(tmp_path / "pq")
    build_pq_index(_df(spark, rows[:20]), idx_dir, m=M, n_codes=K, n_lists=4)
    append_pq_index(_df(spark, rows[20:]), idx_dir)
    assert load_pq_index(spark, idx_dir).meta["n_vectors"] == 30


def test_seed_matrix_collected_once_per_handle(spark, tmp_path, monkeypatch):
    """PQIndex.seed_matrix memoizes the driver collect: consecutive
    multi-probe queries and appends off one handle pay ONE seed
    round-trip (round-12 verdict #6)."""
    import adtech_log_data_pipeline_spark.functions.similarity as sim

    rows = _vecs(n=24, seed=13)
    emb = _df(spark, rows)
    q = spark.createDataFrame(
        [(i, v) for i, v in rows[:2]], "query_id long, qvec array<float>"
    )
    idx_dir = str(tmp_path / "pq")
    sim.build_pq_index(emb, idx_dir, m=M, n_codes=K, n_lists=4)
    idx = sim.load_pq_index(spark, idx_dir)

    calls = []
    real = sim._collect_seed_matrix
    monkeypatch.setattr(
        sim,
        "_collect_seed_matrix",
        lambda seeds: (calls.append(1), real(seeds))[1],
    )
    sim.ivfpq_topk(emb, q, k=3, index=idx, n_probes=2).collect()
    sim.ivfpq_topk(emb, q, k=3, index=idx, n_probes=3).collect()
    assert len(calls) == 1


def test_dedup_update_crash_between_writes_keeps_old_version(
    spark, tmp_path, monkeypatch
):
    """The dedup twin of the PQ law: crash between the bands and
    shingles writes -> the screen still sees the pre-append index (a
    banded-but-unshingled doc would band-match without ever
    Jaccard-verifying); recovery sweeps the orphan."""
    from adtech_log_data_pipeline_spark.functions.dedup import (
        build_dedup_index,
        dedup_incoming_indexed,
        update_dedup_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again today"),
            (2, "the quick brown fox jumps over the lazy dog again tonight"),
            (3, "completely different text about spark query engines here"),
            (4, "another unrelated document mentioning parquet and arrow io"),
        ],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog again today")],
        "doc_id long, text string",
    )
    idx_dir = str(tmp_path / "dd")
    build_dedup_index(docs.filter(F.col("doc_id") <= 2), idx_dir)
    pre = _rows(dedup_incoming_indexed(incoming, idx_dir))

    real = _index_commit._write_relation
    monkeypatch.setattr(_index_commit, "_write_relation", _CrashAfter(1, real))
    with pytest.raises(RuntimeError, match="simulated crash"):
        update_dedup_index(docs.filter(F.col("doc_id") > 2), idx_dir)
    assert _rows(dedup_incoming_indexed(incoming, idx_dir)) == pre

    monkeypatch.setattr(_index_commit, "_write_relation", real)
    update_dedup_index(docs.filter(F.col("doc_id") > 2), idx_dir)
    man = _index_commit.read_index_manifest(idx_dir)
    assert man["version"] == 2
    assert man["relations"] == {"bands": [1, 2], "shingles": [1, 2]}
    # screen against the appended index equals a from-scratch build
    rebuilt_dir = str(tmp_path / "dd2")
    build_dedup_index(docs, rebuilt_dir)
    assert _rows(dedup_incoming_indexed(incoming, idx_dir)) == _rows(
        dedup_incoming_indexed(incoming, rebuilt_dir)
    )


def test_dedup_cap_mismatch_raises(spark, tmp_path):
    from adtech_log_data_pipeline_spark.functions.dedup import (
        build_dedup_index,
        update_dedup_index,
    )

    docs = spark.createDataFrame(
        [(1, "some words repeated here for a tiny shingle relation test")],
        "doc_id long, text string",
    )
    idx_dir = str(tmp_path / "dd")
    build_dedup_index(docs, idx_dir, bucket_cap=100)
    with pytest.raises(ValueError, match="bucket_cap=100"):
        update_dedup_index(docs, idx_dir, bucket_cap=200)


def test_graph_append_crash_is_invisible(spark, tmp_path, monkeypatch):
    """Even the single-relation graph append commits via the manifest:
    a crashed append's partial batch dir is never scanned."""
    from adtech_log_data_pipeline_spark.functions.graph import (
        append_graph_index,
        build_graph_index,
        copurchase_edges,
        load_graph_edges,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    idx_dir = str(tmp_path / "g")
    build_graph_index(li.filter(F.col("l_orderkey") % 2 == 0), idx_dir)
    pre = _rows(load_graph_edges(spark, idx_dir))

    real = _index_commit._write_relation
    monkeypatch.setattr(_index_commit, "_write_relation", _CrashAfter(0, real))
    with pytest.raises(RuntimeError, match="simulated crash"):
        append_graph_index(li.filter(F.col("l_orderkey") % 2 == 1), idx_dir)
    assert _rows(load_graph_edges(spark, idx_dir)) == pre

    monkeypatch.setattr(_index_commit, "_write_relation", real)
    append_graph_index(li.filter(F.col("l_orderkey") % 2 == 1), idx_dir)
    assert _rows(load_graph_edges(spark, idx_dir)) == _rows(
        copurchase_edges(li)
    )


def test_family_mismatch_refused(spark, tmp_path):
    """A dir committed by one family refuses another family's reader —
    one loud error instead of missing-relation confusion."""
    from adtech_log_data_pipeline_spark.functions.graph import load_graph_edges
    from adtech_log_data_pipeline_spark.functions.similarity import (
        build_pq_index,
        load_pq_index,
    )

    idx_dir = str(tmp_path / "pq")
    build_pq_index(_df(spark, _vecs(n=16)), idx_dir, m=M, n_codes=K, n_lists=4)
    with pytest.raises(ValueError, match="holds a 'pq' index"):
        load_graph_edges(spark, idx_dir)
    with pytest.raises(FileNotFoundError, match="no committed pq index"):
        load_pq_index(spark, str(tmp_path / "missing"))


def test_compact_pq_index_preserves_content(spark, tmp_path):
    """compact_pq_index folds multi-batch codes/assign into one batch:
    same rows, meta preserved, superseded batches orphaned then swept,
    and a later append still lands cleanly."""
    from adtech_log_data_pipeline_spark.functions.similarity import (
        append_pq_index,
        build_pq_index,
        compact_pq_index,
        load_pq_index,
    )

    rows = _vecs(n=40, seed=17)
    idx_dir = str(tmp_path / "pq")
    build_pq_index(
        _df(spark, rows[:20]), idx_dir, m=M, n_codes=K, n_lists=4
    )
    append_pq_index(_df(spark, rows[20:30]), idx_dir)
    append_pq_index(_df(spark, rows[30:]), idx_dir)
    pre = load_pq_index(spark, idx_dir)
    pre_codes, pre_assign = _rows(pre.codes), _rows(pre.assign)

    v = compact_pq_index(spark, idx_dir)
    man = _index_commit.read_index_manifest(idx_dir)
    assert v == man["version"] == 4
    assert man["relations"]["codes"] == [4]
    assert man["relations"]["ivf_assign"] == [4]
    assert man["relations"]["codebook"] == [1]  # model untouched
    post = load_pq_index(spark, idx_dir)
    assert _rows(post.codes) == pre_codes
    assert _rows(post.assign) == pre_assign
    assert post.meta == pre.meta

    # orphan sweep at the NEXT commit removes the superseded batches
    append_pq_index(_df(spark, [(100, rows[0][1])]), idx_dir)
    man = _index_commit.read_index_manifest(idx_dir)
    committed = {
        f"{rel}/b={v}" for rel, vs in man["relations"].items() for v in vs
    }
    assert set(_committed_batches(idx_dir)) == committed


def test_compact_graph_index_sum_merges(spark, tmp_path):
    """Graph compaction must SEMANTICALLY sum-merge (concatenation
    would double weights once the single-batch loader short-circuits);
    post-compaction the load is a plain scan equal to the rebuild."""
    from adtech_log_data_pipeline_spark.functions.graph import (
        append_graph_index,
        build_graph_index,
        compact_graph_index,
        copurchase_edges,
        load_graph_edges,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    idx_dir = str(tmp_path / "g")
    build_graph_index(li.filter(F.col("l_orderkey") % 3 == 0), idx_dir)
    append_graph_index(li.filter(F.col("l_orderkey") % 3 == 1), idx_dir)
    append_graph_index(li.filter(F.col("l_orderkey") % 3 == 2), idx_dir)
    compact_graph_index(spark, idx_dir)
    loaded = load_graph_edges(spark, idx_dir)
    plan = loaded._jdf.queryExecution().optimizedPlan().toString()
    assert "Aggregate" not in plan  # single batch short-circuits
    assert _rows(loaded) == _rows(copurchase_edges(li))


def test_vacuum_index_reclaims_orphans(spark, tmp_path):
    import os

    from adtech_log_data_pipeline_spark.functions._index_commit import (
        vacuum_index,
    )
    from adtech_log_data_pipeline_spark.functions.similarity import (
        build_pq_index,
    )

    idx_dir = str(tmp_path / "pq")
    build_pq_index(_df(spark, _vecs(n=16)), idx_dir, m=M, n_codes=K, n_lists=4)
    orphan = os.path.join(idx_dir, "codes", "b=9")
    os.makedirs(orphan)
    removed = vacuum_index(idx_dir)
    assert removed == [orphan] and not os.path.isdir(orphan)
    assert vacuum_index(idx_dir) == []
