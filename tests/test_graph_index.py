"""Persisted co-purchase edge index (functions/graph.py::build_graph_index
/ append_graph_index / load_graph_edges): the append == rebuild additive
law and the artifact-consumption equalities every graph query relies on."""

import os

from pyspark.sql import functions as F


def _li(spark):
    return spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")


def _edge_set(df):
    return sorted(
        (r["p1"], r["p2"], r["w"]) for r in df.select("p1", "p2", "w").collect()
    )


def test_append_equals_rebuild_over_order_disjoint_batches(spark, tmp_path):
    """The core law: build on batch A + append batches B, C (orders
    disjoint across batches) == from-scratch copurchase_edges over the
    full lineitem, exact row set."""
    from adtech_log_data_pipeline_spark.functions.graph import (
        append_graph_index,
        build_graph_index,
        copurchase_edges,
        load_graph_edges,
    )

    li = _li(spark)
    idx = str(tmp_path / "idx")
    build_graph_index(li.filter(F.col("l_orderkey") % 3 == 0), idx)
    append_graph_index(li.filter(F.col("l_orderkey") % 3 == 1), idx)
    append_graph_index(li.filter(F.col("l_orderkey") % 3 == 2), idx)
    assert _edge_set(load_graph_edges(spark, idx)) == _edge_set(
        copurchase_edges(li)
    )
    # three batch dirs were written (the loader sum-merged them)
    assert len(os.listdir(os.path.join(idx, "edges"))) == 3


def test_single_batch_short_circuits_to_plain_scan(spark, tmp_path):
    from adtech_log_data_pipeline_spark.functions.graph import (
        build_graph_index,
        copurchase_edges,
        load_graph_edges,
    )

    li = _li(spark)
    idx = str(tmp_path / "idx")
    build_graph_index(li, idx)
    loaded = load_graph_edges(spark, idx)
    # no merge aggregate in the single-batch plan (pure artifact scan)
    assert "Aggregate" not in loaded._jdf.queryExecution().optimizedPlan().toString()
    assert _edge_set(loaded) == _edge_set(copurchase_edges(li))


def test_rebuild_overwrites_previous_batches(spark, tmp_path):
    """build_graph_index is the nightly REBUILD: any prior batch dirs are
    replaced, not merged into (re-running a build must not double
    weights)."""
    from adtech_log_data_pipeline_spark.functions.graph import (
        append_graph_index,
        build_graph_index,
        copurchase_edges,
        load_graph_edges,
    )

    li = _li(spark)
    idx = str(tmp_path / "idx")
    build_graph_index(li.filter(F.col("l_orderkey") % 2 == 0), idx)
    append_graph_index(li.filter(F.col("l_orderkey") % 2 == 1), idx)
    build_graph_index(li, idx)
    assert len(os.listdir(os.path.join(idx, "edges"))) == 1
    assert _edge_set(load_graph_edges(spark, idx)) == _edge_set(
        copurchase_edges(li)
    )


def test_missing_index_raises_loudly(spark, tmp_path):
    import pytest

    from adtech_log_data_pipeline_spark.functions.graph import load_graph_edges

    with pytest.raises(FileNotFoundError, match="graph-index"):
        load_graph_edges(spark, str(tmp_path / "nope"))


def test_graph_queries_from_artifact_equal_direct(spark, tmp_path):
    """Consumption equality: shortest path and pagerank computed from the
    loaded artifact equal the direct-from-lineitem results (reachability
    is covered by the declared graph_reachability_indexed oracle gate)."""
    from adtech_log_data_pipeline_spark.functions.graph import (
        append_graph_index,
        bounded_shortest_path,
        build_graph_index,
        copurchase_edges,
        load_graph_edges,
        weighted_pagerank,
    )

    li = _li(spark)
    idx = str(tmp_path / "idx")
    build_graph_index(li.filter(F.col("l_orderkey") % 2 == 0), idx)
    append_graph_index(li.filter(F.col("l_orderkey") % 2 == 1), idx)
    edges = load_graph_edges(spark, idx)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    assert rows(bounded_shortest_path(edges, seed_mod=50, k=2)) == rows(
        bounded_shortest_path(copurchase_edges(li), seed_mod=50, k=2)
    )
    assert rows(weighted_pagerank(edges, iters=2)) == rows(
        weighted_pagerank(copurchase_edges(li), iters=2)
    )


def test_cli_graph_index_jobs(spark, tmp_path):
    """CLI wiring: --job graph-index builds, --job graph-index-append
    appends, --job pagerank --against consumes the artifact."""
    from adtech_log_data_pipeline_spark.__main__ import main

    idx = str(tmp_path / "idx")
    out = str(tmp_path / "ranks")
    sf = "/root/testdata/sf0.001"
    li_path = os.path.join(sf, "lineitem.parquet")
    assert main(["--job", "graph-index", "--input", li_path, "--output", idx]) in (0, None)
    assert (
        main(
            ["--job", "graph-index-append", "--input", li_path,
             "--against", idx, "--output", idx]
        )
        in (0, None)
    )
    assert (
        main(["--job", "pagerank", "--against", idx, "--output", out])
        in (0, None)
    )
    got = spark.read.parquet(out)
    assert got.count() > 0 and set(got.columns) == {"node", "deg_w", "rank_micro"}
