"""Maintenance jobs: incremental checkpointed ingest (exactly-once delta
processing of a growing directory) and small-files compaction."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from adtech_log_data_pipeline_spark.jobs.maintenance import (
    compact_parquet,
    incremental_ingest,
)

SCHEMA = "id long, v string"


def _write_batch(spark, d, ids):
    spark.createDataFrame(
        [(i, f"v{i}") for i in ids], SCHEMA
    ).coalesce(1).write.mode("append").parquet(d)


def test_incremental_ingest_processes_only_new_files(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(spark, src, range(0, 5))
    n1 = incremental_ingest(spark, src, out, ckpt, schema=SCHEMA)
    assert n1 == 5
    assert spark.read.parquet(out).count() == 5

    # second invocation on an UNCHANGED directory is a no-op
    n2 = incremental_ingest(spark, src, out, ckpt, schema=SCHEMA)
    assert n2 == 0
    assert spark.read.parquet(out).count() == 5

    # new arrivals: only the delta is read; output accretes exactly once
    _write_batch(spark, src, range(5, 12))
    n3 = incremental_ingest(spark, src, out, ckpt, schema=SCHEMA)
    assert n3 == 7
    back = spark.read.parquet(out)
    assert back.count() == 12
    assert {r["id"] for r in back.collect()} == set(range(12))


def test_incremental_ingest_applies_transform(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, src, range(10))
    incremental_ingest(
        spark,
        src,
        out,
        ckpt,
        schema=SCHEMA,
        transform=lambda df: df.filter(F.col("id") % 2 == 0),
    )
    assert {r["id"] for r in spark.read.parquet(out).collect()} == {0, 2, 4, 6, 8}


def test_ingest_and_compact_cli(spark, tmp_path):
    """--job ingest / --job compact dispatch through the CLI."""
    from adtech_log_data_pipeline_spark.__main__ import main

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, src, range(6))
    rc = main(
        ["--job", "ingest", "--input", src, "--output", out,
         "--checkpoint", ckpt, "--schema", SCHEMA]
    )
    assert rc == 0 and spark.read.parquet(out).count() == 6
    comp = str(tmp_path / "comp")
    rc = main(["--job", "compact", "--input", out, "--output", comp])
    assert rc == 0 and spark.read.parquet(comp).count() == 6


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    src = str(tmp_path / "many")
    out = str(tmp_path / "compacted")
    # 12 tiny files
    for i in range(12):
        _write_batch(spark, src, range(i * 10, i * 10 + 10))
    n_in = sum(
        1
        for root, _d, fs in os.walk(src)
        for f in fs
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )
    assert n_in >= 12
    n_parts = compact_parquet(spark, src, out, sort_cols=["id"])
    assert n_parts == 1  # tiny input -> one target-sized file
    n_out = sum(
        1
        for root, _d, fs in os.walk(out)
        for f in fs
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )
    assert n_out == 1
    assert spark.read.parquet(out).count() == 120
    # content identical to the input
    assert (
        spark.read.parquet(out).exceptAll(spark.read.parquet(src)).count() == 0
    )


def test_bucketized_join_plans_without_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key with the same bucket count must
    sort-merge join with NO Exchange on either side — the co-located-join
    contract that makes repeated fact-to-fact joins affordable at 100 TB.
    Also checks the bucket-pruned result matches the plain-parquet join."""
    from adtech_log_data_pipeline_spark.jobs.maintenance import bucketize_table

    sf = "/root/testdata/sf0.001"
    bucketize_table(
        spark, f"{sf}/orders.parquet", "bkt_orders", ["o_orderkey"],
        n_buckets=4, path=str(tmp_path / "bkt_orders"),
    )
    bucketize_table(
        spark, f"{sf}/lineitem.parquet", "bkt_lineitem", ["l_orderkey"],
        n_buckets=4, path=str(tmp_path / "bkt_lineitem"),
    )
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        # force the sort-merge path (broadcast would trivially avoid the
        # shuffle at THIS scale but not at fact-to-fact scale)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("bkt_lineitem").join(
                spark.table("bkt_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            import io
            from contextlib import redirect_stdout

            buf = io.StringIO()
            with redirect_stdout(buf):
                joined.explain("simple")
            plan = buf.getvalue()
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning" not in plan, plan
            # same rows as the unbucketed formulation
            plain = spark.read.parquet(f"{sf}/lineitem.parquet").join(
                spark.read.parquet(f"{sf}/orders.parquet"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            assert joined.count() == plain.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_profile_cli(spark, tmp_path):
    """--job profile writes the per-column QA report as JSON."""
    import json

    from adtech_log_data_pipeline_spark.__main__ import main

    src = str(tmp_path / "psrc")
    out = str(tmp_path / "pout")
    _write_batch(spark, src, range(8))
    rc = main(["--job", "profile", "--input", src, "--output", out])
    assert rc == 0
    rows = []
    for p in (tmp_path / "pout").glob("part-*.json"):
        rows += [json.loads(l) for l in p.read_text().splitlines()]
    by_col = {r["col"]: r for r in rows}
    assert set(by_col) == {"id", "v"}
    assert by_col["id"]["n_rows"] == 8 and by_col["id"]["n_distinct"] == 8


def test_range_sort_table_disjoint_sorted_files(spark, tmp_path):
    """Zone-map layout law: output files hold disjoint, internally
    sorted key ranges (so min/max row-group stats prune point lookups),
    and the plan is a RangePartitioning exchange + in-partition sort."""
    import glob

    from adtech_log_data_pipeline_spark.jobs.maintenance import range_sort_table

    src = str(tmp_path / "src")
    spark.range(0, 10000, 1, 8).selectExpr(
        "cast(hash(id) % 1000 as long) as k", "id as payload"
    ).write.parquet(src)
    out = str(tmp_path / "out")
    n = range_sort_table(spark, src, out, ["k"], n_partitions=4)
    assert n == 4

    plan = (
        spark.read.parquet(src)
        .repartitionByRange(4, "k")
        .sortWithinPartitions("k")
        ._jdf.queryExecution()
        .toString()
    )
    assert "rangepartitioning" in plan.lower()

    ranges = []
    total = 0
    for f in glob.glob(f"{out}/part-*.parquet"):
        pdf = spark.read.parquet(f).select("k").toPandas()
        if len(pdf) == 0:
            continue
        ks = pdf["k"].tolist()
        assert ks == sorted(ks)  # sorted within file
        ranges.append((ks[0], ks[-1]))
        total += len(ks)
    assert total == 10000
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo  # disjoint key ranges across files


def test_zorder_key_matches_python_interleave(spark):
    """The mask-shift Morton key equals a bit-by-bit Python interleave
    for random 31-bit pairs (hypothesis), and is monotone in each
    coordinate when the other is fixed."""
    import hypothesis.strategies as st
    from hypothesis import HealthCheck, given, settings

    from adtech_log_data_pipeline_spark.jobs.maintenance import zorder_key

    def py_interleave(x: int, y: int) -> int:
        z = 0
        for i in range(32):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    @settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
    @given(pairs=st.lists(
        st.tuples(st.integers(0, 2**31 - 1), st.integers(0, 2**31 - 1)),
        min_size=1, max_size=20,
    ))
    def law(pairs):
        df = spark.createDataFrame(pairs, "x long, y long")
        out = df.select("x", "y", zorder_key("x", "y").alias("z")).collect()
        for r in out:
            assert r["z"] == py_interleave(r["x"], r["y"])

    law()


def test_zorder_table_prunes_both_dims(spark, tmp_path):
    """Z-ordered files must cover small rectangles in BOTH columns: for a
    uniform 2-d grid, every file's (x, y) bounding box is a strict
    fraction of the global domain (a 1-d sort would cover the full range
    of the second column in every file)."""
    import glob

    from adtech_log_data_pipeline_spark.jobs.maintenance import zorder_table

    src = str(tmp_path / "src")
    spark.range(0, 4096).selectExpr(
        "cast(id % 64 as long) as x", "cast(id div 64 as long) as y"
    ).write.parquet(src)
    out = str(tmp_path / "out")
    zorder_table(spark, src, out, "x", "y", n_partitions=16)

    worst_side = 0
    n_files = 0
    for f in glob.glob(f"{out}/part-*.parquet"):
        pdf = spark.read.parquet(f).toPandas()
        if len(pdf) == 0:
            continue
        n_files += 1
        side = max(
            pdf["x"].max() - pdf["x"].min() + 1,
            pdf["y"].max() - pdf["y"].min() + 1,
        )
        worst_side = max(worst_side, side)
    assert n_files > 1
    # 16 files over a 64x64 grid: the ideal Z split is 16x16 squares.
    # The discriminating metric is the bbox's LONGEST side — a
    # lexicographic (x, y) sort also reaches area 256 per file, but as a
    # 4x64 sliver whose y-side spans the full domain. Allow boundary
    # slop (range split points come from sampling) but require every
    # file to stay well under a full-domain side.
    assert worst_side <= 32


def test_snapshot_diff_statuses(spark, tmp_path):
    from adtech_log_data_pipeline_spark.jobs.maintenance import snapshot_diff

    old = str(tmp_path / "old")
    new = str(tmp_path / "new")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, v double",
    ).write.parquet(old)
    spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 31.0), (4, "d", 40.0)],
        "k long, s string, v double",
    ).write.parquet(new)
    out = {r["k"]: r["status"] for r in snapshot_diff(spark, old, new, ["k"]).collect()}
    assert out == {1: "removed", 3: "changed", 4: "added"}

    # identical snapshots -> empty diff
    assert snapshot_diff(spark, old, old, ["k"]).count() == 0

    import pytest

    spark.createDataFrame([(1, "a")], "k long, other string").write.parquet(
        str(tmp_path / "bad")
    )
    with pytest.raises(ValueError):
        snapshot_diff(spark, old, str(tmp_path / "bad"), ["k"])


def test_spanclean_cli(spark, tmp_path):
    """--job spanclean: cleaned parquet lands with the span-removal schema
    and a shared 25-token passage is actually cut."""
    from adtech_log_data_pipeline_spark.__main__ import main

    src = str(tmp_path / "docs")
    out = str(tmp_path / "clean")
    passage = " ".join(f"p{i}" for i in range(25))
    rows = [
        (0, "u0 u1 u2 " + passage, "en", "s", 0),
        (1, passage + " v0", "en", "s", 0),
        (2, " ".join(f"w{i}" for i in range(30)), "en", "s", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(src)
    rc = main(["--job", "spanclean", "--input", src, "--output", out])
    assert rc == 0
    got = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert got[0]["clean_text"] == "u0 u1 u2"
    assert got[1]["clean_text"] == "v0"
    assert got[2]["n_tokens_kept"] == 30


def test_span_index_screen_and_quantize_cli(spark, tmp_path):
    """--job span-index / span-screen / quantize dispatch through the CLI."""
    from adtech_log_data_pipeline_spark.__main__ import main

    docs_src = str(tmp_path / "docs")
    passage = " ".join(f"p{i}" for i in range(25))
    spark.createDataFrame(
        [(0, passage + " x0 x1", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(docs_src)
    idx = str(tmp_path / "idx")
    assert main(["--job", "span-index", "--input", docs_src, "--output", idx]) == 0
    inc_src = str(tmp_path / "inc")
    spark.createDataFrame(
        [(10, "y0 y1 " + passage, "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(inc_src)
    screened = str(tmp_path / "screened")
    assert main(
        ["--job", "span-screen", "--input", inc_src, "--against", idx,
         "--output", screened]
    ) == 0
    row = spark.read.parquet(screened).collect()[0]
    assert row["n_spans"] == 1 and row["dup_tokens"] == 25

    emb_src = str(tmp_path / "emb")
    spark.createDataFrame(
        [(0, [1.0, -1.0], 0)], "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(emb_src)
    qout = str(tmp_path / "q")
    assert main(["--job", "quantize", "--input", emb_src, "--output", qout]) == 0
    codes = {r["dim"]: r["q"] for r in spark.read.parquet(qout).collect()}
    assert codes == {0: 127, 1: 0}


def test_triangles_and_attribution_cli(spark, tmp_path):
    """--job triangles / --job attribution dispatch through the CLI."""
    import json

    from adtech_log_data_pipeline_spark.__main__ import main

    li = str(tmp_path / "li")
    spark.createDataFrame(
        [(1, 10), (1, 20), (1, 30), (2, 10), (2, 20), (2, 30)],
        "l_orderkey long, l_partkey long",
    ).write.parquet(li)
    out = str(tmp_path / "tri")
    rc = main(["--job", "triangles", "--input", li, "--output", out])
    assert rc == 0
    row = json.loads(
        next(
            open(os.path.join(out, f))
            for f in os.listdir(out)
            if f.endswith(".json")
        ).readline()
    )
    # both orders hold the same 3-part basket: K3, one triangle
    assert row["n_triangles"] == 1 and row["n_edges"] == 3

    att = str(tmp_path / "att")
    rc = main(
        ["--job", "attribution", "--sf-dir", "/root/testdata/sf0.001",
         "--output", att]
    )
    assert rc == 0 and spark.read.parquet(att).count() > 0


def test_pca_cli(spark, tmp_path):
    """--job pca writes components + explained variance JSON."""
    import json
    import random

    from adtech_log_data_pipeline_spark.__main__ import main

    rng = random.Random(1)
    emb = str(tmp_path / "emb")
    spark.createDataFrame(
        [
            (i, [rng.uniform(-1, 1) for _ in range(6)], 0)
            for i in range(50)
        ],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(emb)
    out = str(tmp_path / "pca")
    rc = main(["--job", "pca", "--input", emb, "--output", out,
               "--n-buckets", "3"])
    assert rc == 0
    art = json.load(open(os.path.join(out, "pca.json")))
    assert len(art["components"]) == 3
    assert len(art["components"][0]) == 6
    assert len(art["explained_variance"]) == 3


def test_explain_cli_job(spark, tmp_path):
    """--job explain writes the formatted physical plan of a declared
    query and the plan shows the pushed-down scan."""
    from adtech_log_data_pipeline_spark.__main__ import main

    out = str(tmp_path / "plan")
    rc = main(
        [
            "--job", "explain", "--table", "pricing_summary",
            "--sf-dir", "/root/testdata/sf0.001",
            "--output", out, "--master", "local[2]",
        ]
    )
    assert rc == 0
    plan = open(f"{out}/plan.txt").read()
    assert "Physical Plan" in plan and "Scan parquet" in plan
    assert "PushedFilters" in plan
