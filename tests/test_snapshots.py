"""Snapshot-versioned tables (jobs/maintenance.py::publish_snapshot /
read_snapshot / vacuum_snapshots): crash-point laws for the atomic
pointer commit — same discipline as the CM compaction protocol tests."""

import json
import os

from pyspark.sql import functions as F


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


def _keys(df):
    return sorted(r["k"] for r in df.collect())


def test_publish_then_asof_read_isolates_versions(spark, tmp_path):
    from adtech_log_data_pipeline_spark.jobs.maintenance import (
        publish_snapshot,
        read_snapshot,
        snapshot_current_version,
    )

    t = str(tmp_path / "tbl")
    v1 = publish_snapshot(_df(spark, 0, 10), t)
    v2 = publish_snapshot(_df(spark, 5, 20), t)
    assert (v1, v2) == (1, 2)
    assert snapshot_current_version(t) == 2
    assert _keys(read_snapshot(spark, t)) == list(range(5, 20))
    assert _keys(read_snapshot(spark, t, version=1)) == list(range(10))


def test_crash_before_pointer_flip_keeps_old_version(spark, tmp_path):
    """Crash point: the new version dir is fully written but the pointer
    replace never ran. Readers must still see the OLD version; the next
    publish must DELETE the orphan (if it merely skipped the number, the
    uncommitted data would become readable once the pointer passed it)."""
    from adtech_log_data_pipeline_spark.jobs.maintenance import (
        publish_snapshot,
        read_snapshot,
        snapshot_current_version,
    )

    t = str(tmp_path / "tbl")
    publish_snapshot(_df(spark, 0, 10), t)
    # simulate the crashed publish: v=2 data lands, pointer untouched
    _df(spark, 100, 110).write.parquet(os.path.join(t, "v=2"))
    assert snapshot_current_version(t) == 1
    assert _keys(read_snapshot(spark, t)) == list(range(10))
    # the orphan is refused as an explicit as-of target too
    import pytest

    with pytest.raises(ValueError, match="not committed"):
        read_snapshot(spark, t, version=2)
    # recovery: the next publish deletes the orphan and commits its OWN
    # data as version 2 — the crashed rows are gone, not resurrected
    v = publish_snapshot(_df(spark, 200, 205), t)
    assert v == 2
    assert _keys(read_snapshot(spark, t)) == list(range(200, 205))
    assert _keys(read_snapshot(spark, t, version=2)) == list(range(200, 205))


def test_crash_leftover_tmp_pointer_is_ignored(spark, tmp_path):
    """A _CURRENT.tmp left by a crash between write and rename must not
    affect the committed version (only the atomic replace commits)."""
    from adtech_log_data_pipeline_spark.jobs.maintenance import (
        publish_snapshot,
        read_snapshot,
        snapshot_current_version,
    )

    t = str(tmp_path / "tbl")
    publish_snapshot(_df(spark, 0, 5), t)
    with open(os.path.join(t, "_CURRENT.tmp"), "w", encoding="utf-8") as fh:
        json.dump({"version": 99}, fh)
    assert snapshot_current_version(t) == 1
    assert _keys(read_snapshot(spark, t)) == list(range(5))
    # a subsequent publish replaces the stale tmp as part of its own
    # write-tmp + replace and commits cleanly
    assert publish_snapshot(_df(spark, 5, 8), t) == 2
    assert snapshot_current_version(t) == 2


def test_vacuum_keeps_recent_drops_old_and_orphans(spark, tmp_path):
    import pytest

    from adtech_log_data_pipeline_spark.jobs.maintenance import (
        publish_snapshot,
        read_snapshot,
        vacuum_snapshots,
    )

    t = str(tmp_path / "tbl")
    for i in range(4):
        publish_snapshot(_df(spark, i, i + 3), t)
    # orphan beyond the pointer (crashed publish)
    _df(spark, 0, 1).write.parquet(os.path.join(t, "v=9"))
    removed = vacuum_snapshots(t, keep_last=2)
    assert removed == [1, 2, 9]
    assert _keys(read_snapshot(spark, t, version=3)) == [2, 3, 4]
    assert _keys(read_snapshot(spark, t)) == [3, 4, 5]
    with pytest.raises(ValueError, match="not retained"):
        read_snapshot(spark, t, version=1)


def test_read_before_any_publish_raises(spark, tmp_path):
    import pytest

    from adtech_log_data_pipeline_spark.jobs.maintenance import read_snapshot

    with pytest.raises(FileNotFoundError, match="no committed snapshot"):
        read_snapshot(spark, str(tmp_path / "tbl"))


def test_cli_snapshot_jobs(spark, tmp_path):
    from adtech_log_data_pipeline_spark.__main__ import main
    from adtech_log_data_pipeline_spark.jobs.maintenance import (
        read_snapshot,
        snapshot_current_version,
    )

    src = str(tmp_path / "src")
    t = str(tmp_path / "tbl")
    _df(spark, 0, 7).write.parquet(src)
    assert main(["--job", "snapshot", "--input", src, "--output", t]) in (0, None)
    assert main(["--job", "snapshot", "--input", src, "--output", t]) in (0, None)
    assert main(["--job", "snapshot", "--input", src, "--output", t]) in (0, None)
    assert snapshot_current_version(t) == 3
    assert (
        main(["--job", "snapshot-vacuum", "--keep-last", "1", "--output", t])
        in (0, None)
    )
    assert _keys(read_snapshot(spark, t)) == list(range(7))
    assert sorted(
        p for p in os.listdir(t) if p.startswith("v=")
    ) == ["v=3"]
    # MERGE via the CLI: one upsert (k=0 -> stays), one insert (k=9),
    # one delete (k=3)
    chg = str(tmp_path / "chg")
    spark.createDataFrame(
        [(0, "U", 1), (9, "U", 1), (3, "D", 1)], "k long, op string, seq int"
    ).write.parquet(chg)
    assert (
        main(
            ["--job", "snapshot-merge", "--input", chg, "--output", t,
             "--bucket-cols", "k", "--seq-cols", "seq"]
        )
        in (0, None)
    )
    assert snapshot_current_version(t) == 4
    assert _keys(read_snapshot(spark, t)) == [0, 1, 2, 4, 5, 6, 9]


def test_merge_snapshot_isolation_and_semantics(spark, tmp_path):
    """merge_snapshot = apply_changelog ∘ publish_snapshot: the merged
    version equals the CDC law's result, the pre-merge version stays
    readable bit-unchanged, and a crash during the merge's publish leaves
    the old version current."""
    from pyspark.sql import functions as F

    from adtech_log_data_pipeline_spark.jobs.maintenance import (
        merge_snapshot,
        publish_snapshot,
        read_snapshot,
        snapshot_current_version,
    )
    from adtech_log_data_pipeline_spark.operators.cdc import apply_changelog

    t = str(tmp_path / "tbl")
    base = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    publish_snapshot(base, t)
    changes = spark.createDataFrame(
        [(3, 999, "U", 1), (10, 100, "U", 1), (5, 0, "D", 1), (3, 777, "U", 2)],
        "k long, v long, op string, seq int",
    )
    v2 = merge_snapshot(spark, t, changes, ["k"], ["seq"], "op")
    assert v2 == 2
    got = {r["k"]: r["v"] for r in read_snapshot(spark, t).collect()}
    want = {
        r["k"]: r["v"]
        for r in apply_changelog(base, changes, ["k"], ["seq"], "op").collect()
    }
    assert got == want
    assert got[3] == 777 and got[10] == 100 and 5 not in got
    # version isolation: v1 is bit-unchanged
    assert {r["k"]: r["v"] for r in read_snapshot(spark, t, version=1).collect()} == {
        i: i * 10 for i in range(10)
    }
    # crash during a second merge's publish (dir written, pointer not
    # flipped): simulate by hand-writing the would-be v=3 dir
    spark.range(1).selectExpr("id as k", "id as v").write.parquet(
        os.path.join(t, "v=3")
    )
    assert snapshot_current_version(t) == 2
    assert {r["k"] for r in read_snapshot(spark, t).collect()} == set(want)
