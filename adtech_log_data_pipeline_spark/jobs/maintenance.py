"""Pipeline-maintenance jobs: incremental (checkpointed) batch ingest and
small-files compaction — the two operational patterns every long-lived
100 TB ingest needs and the reference delegates to Dataflow/BigQuery
(templates + load jobs); here they are engine-owned.

Incremental ingest: `Trigger.availableNow` over a file-source checkpoint
is Spark's native incremental-batch runner — each invocation processes
exactly the files that arrived since the last run (offsets live in the
checkpoint), writes append-only output through the exactly-once file sink,
and stops. Re-running on an unchanged directory is a no-op. This replaces
the hand-rolled "list files, diff against a manifest, process the delta"
driver loop with engine-tracked state that survives crashes mid-batch.

Compaction: streaming/incremental sinks accrete small files (one+ per
micro-batch per partition); query-side scan cost and NameNode/listing
pressure grow with file COUNT, not bytes. The compactor rewrites a
directory to ~target-sized files, sizing the partition count from parquet
footer metadata (no data scan) and sorting within partitions for
row-group locality.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def incremental_ingest(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str | None = None,
    transform=None,
) -> int:
    """Process files that arrived in ``in_dir`` since the last invocation
    (parquet), apply ``transform`` (DataFrame -> DataFrame, optional), and
    append to ``out_dir`` exactly once. Returns the number of input rows
    this run consumed. ``schema`` (DDL string) is required on the first
    run if the directory may be empty; otherwise inferred from one footer.
    """
    if schema is None:
        schema_struct = spark.read.parquet(in_dir).schema
    else:
        from pyspark.sql.types import _parse_datatype_string

        schema_struct = _parse_datatype_string(schema)
    stream = spark.readStream.schema(schema_struct).parquet(in_dir)
    if transform is not None:
        stream = transform(stream)
    # Count consumed rows via a StreamingQueryListener: O(1) memory at any
    # backlog depth. q.recentProgress is a bounded buffer (default 100
    # entries) and would undercount a >100-micro-batch backlog.
    import time

    from pyspark.sql.streaming import StreamingQueryListener

    class _RowCounter(StreamingQueryListener):
        def __init__(self) -> None:
            self.by_query: dict[str, int] = {}
            self.terminated: set[str] = set()

        def onQueryStarted(self, event) -> None:
            pass

        def onQueryProgress(self, event) -> None:
            p = event.progress
            self.by_query[str(p.id)] = (
                self.by_query.get(str(p.id), 0) + int(p.numInputRows)
            )

        def onQueryIdle(self, event) -> None:
            pass

        def onQueryTerminated(self, event) -> None:
            self.terminated.add(str(event.id))

    counter = _RowCounter()
    spark.streams.addListener(counter)
    try:
        q = (
            stream.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # listener events are delivered asynchronously: wait for this
        # query's terminate event so every progress update has landed
        qid = str(q.id)
        deadline = time.time() + 60
        while qid not in counter.terminated and time.time() < deadline:
            time.sleep(0.05)
        return counter.by_query.get(qid, 0)
    finally:
        spark.streams.removeListener(counter)


def bucketize_table(
    spark: SparkSession,
    in_path: str,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Rewrite a parquet directory as a bucketed, bucket-sorted catalog
    table so every later equi-join or aggregation on ``bucket_cols`` is
    shuffle-free (Spark's hash-bucket layout satisfies the join's
    HashPartitioning requirement at plan time — EnsureRequirements inserts
    no Exchange).

    This is the co-located-join maintenance pass for fact-to-fact joins
    too big to broadcast: at 100 TB, orders⋈lineitem on orderkey shuffles
    BOTH tables on every query unless they are pre-bucketed on the key;
    bucketing pays the shuffle once at write time and amortizes it over
    every subsequent query. Both sides must use the SAME bucket count (or
    an integer multiple, with bucket coalescing enabled) for the
    co-location to hold.

    ``sort_cols`` (default: the bucket columns) orders rows inside each
    bucket file, which also removes the per-partition Sort from
    sort-merge joins when each bucket holds a single file.
    """
    df: DataFrame = spark.read.parquet(in_path)
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


TARGET_FILE_BYTES = 128 * 1024 * 1024  # ~one HDFS/object-store block


def compact_parquet(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite ``in_dir`` to ``out_dir`` as ~target-sized parquet files.
    Partition count comes from the input's on-disk byte size (file listing
    only — no data scan, no count job); ``sort_cols`` orders rows within
    each output partition so row-group min/max stats stay selective.
    Returns the chosen partition count.

    At 100 TB this runs per partition-directory (e.g. per dt=) rather than
    over the whole table root; the sizing logic is identical."""
    # size via the Hadoop FileSystem API so any scheme Spark can read
    # (hdfs://, s3a://, file:) sizes correctly — a local os.walk would
    # silently return 0 bytes for remote paths and collapse the rewrite
    # to a single partition
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(in_dir)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(jpath, True)
    total = 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.endswith(".parquet") and not name.startswith((".", "_")):
            total += st.getLen()
    n_parts = max(1, (total + target_file_bytes - 1) // target_file_bytes)
    df: DataFrame = spark.read.parquet(in_dir)
    out = df.repartition(n_parts)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").parquet(out_dir)
    return n_parts


def range_sort_table(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    sort_cols: list[str],
    n_partitions: int | None = None,
    target_file_bytes: int = TARGET_FILE_BYTES,
) -> int:
    """Rewrite a table GLOBALLY range-partitioned + sorted on
    ``sort_cols`` — the zone-map layout: every output file covers a
    disjoint key range, so a point/range predicate on the sort key prunes
    to ~one file via parquet row-group min/max stats (and a later merge
    join on the key needs no sort).

    Scale shape: repartitionByRange samples the key distribution
    (reservoir per partition — no full scan) to pick balanced split
    points, then one range-shuffle + per-partition sort; contrast
    compact_parquet, which keeps arrival order and only sorts WITHIN
    partitions. Partition count defaults to the same on-disk-bytes
    sizing as compaction. Returns the partition count."""
    if n_partitions is None:
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(in_dir)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        it = fs.listFiles(jpath, True)
        total = 0
        while it.hasNext():
            st = it.next()
            name = st.getPath().getName()
            if name.endswith(".parquet") and not name.startswith((".", "_")):
                total += st.getLen()
        n_partitions = max(1, (total + target_file_bytes - 1) // target_file_bytes)
    df: DataFrame = spark.read.parquet(in_dir)
    (
        df.repartitionByRange(n_partitions, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return n_partitions


def zorder_key(col_x: str, col_y: str):
    """Morton/Z-order key of two non-negative 31-bit int columns: bits of
    x and y interleaved into one bigint (x in even positions). Sorting on
    this key gives MULTI-dimensional file locality — each range-sorted
    output file covers a small rectangle in (x, y), so parquet min/max
    stats prune predicates on EITHER column (the Delta/Iceberg
    OPTIMIZE ZORDER layout, built from five mask-shift spreading steps —
    pure JVM bit arithmetic, codegen-friendly, no UDF). NULL in either
    column yields a NULL key (sorts first, together)."""
    from pyspark.sql import functions as F

    def spread(c: str) -> str:
        # spread 32 -> 64 bits: classic magic-mask sequence
        v = f"(cast({c} as bigint) & 4294967295)"
        for shift, mask in (
            (16, 0x0000FFFF0000FFFF),
            (8, 0x00FF00FF00FF00FF),
            (4, 0x0F0F0F0F0F0F0F0F),
            (2, 0x3333333333333333),
            (1, 0x5555555555555555),
        ):
            v = f"((({v}) | shiftleft(({v}), {shift})) & {mask})"
        return v

    return F.expr(f"({spread(col_x)}) | shiftleft(({spread(col_y)}), 1)")


def zorder_table(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    col_x: str,
    col_y: str,
    n_partitions: int = 8,
) -> int:
    """Rewrite a table Z-ordered on two columns: range-partition + sort on
    the interleaved key, then drop it — the written files carry tight
    min/max rectangles on BOTH columns. Returns the partition count."""
    df: DataFrame = spark.read.parquet(in_dir)
    (
        df.withColumn("__z", zorder_key(col_x, col_y))
        .repartitionByRange(n_partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return n_partitions


def snapshot_diff(
    spark: SparkSession,
    old_dir: str,
    new_dir: str,
    key_cols: list[str],
) -> DataFrame:
    """Key-level diff of two parquet snapshots:
    (key_cols..., status in {added, removed, changed}) — the audit a
    nightly-rebuild pipeline runs before promoting a new table version.

    Scale shape: each side collapses to (keys, fingerprint) MAP-SIDE —
    the md5 of the canonical JSON of the sorted non-key columns — so
    wide rows never shuffle; the full-outer join is the single co-keyed
    shuffle. Identical rows produce no output (the common case streams
    through the join and is filtered without materializing)."""
    old = spark.read.parquet(old_dir)
    new = spark.read.parquet(new_dir)
    if sorted(old.columns) != sorted(new.columns):
        raise ValueError(
            f"snapshot schemas differ: {sorted(old.columns)} vs {sorted(new.columns)}"
        )
    non_key = sorted(c for c in new.columns if c not in key_cols)

    def fingerprint(df: DataFrame, alias: str) -> DataFrame:
        return df.select(
            *key_cols,
            F.md5(F.to_json(F.struct(*non_key))).alias(alias),
        )

    j = fingerprint(old, "__ho").join(
        fingerprint(new, "__hn"), key_cols, "full_outer"
    )
    status = (
        F.when(F.col("__ho").isNull(), F.lit("added"))
        .when(F.col("__hn").isNull(), F.lit("removed"))
        .when(F.col("__ho") != F.col("__hn"), F.lit("changed"))
    )
    return (
        j.select(*key_cols, status.alias("status"))
        .filter(F.col("status").isNotNull())
    )


# --- snapshot-versioned tables (time travel) --------------------------------
#
# The capstone of the maintenance story: an atomic snapshot pointer over
# immutable version directories — publish-then-flip, so readers see either
# the old version or the new one, never a half-written mix (the minimal
# engine-owned twin of a Delta/Iceberg table version chain). Layout:
#
#   table_dir/v=<n>/        immutable parquet snapshot n (1-based)
#   table_dir/_CURRENT      atomic pointer: {"version": n}
#
# Commit protocol (same discipline as streaming/cm_stream.py's marker
# commit): the new version dir is fully written FIRST (invisible —
# readers only follow the pointer), then the pointer file is replaced
# via write-tmp + os.replace, which is atomic on POSIX. Crash before the
# replace: the pointer still names the old version and the orphan dir is
# dead weight (vacuum removes it; the next publish never reuses its
# number). Crash after: the publish is complete. There is no window
# where a reader can observe a partial table.

_SNAPSHOT_PTR = "_CURRENT"


def _snapshot_dir_versions(table_dir: str) -> list[int]:
    import glob
    import os

    out = []
    for p in glob.glob(os.path.join(table_dir, "v=*")):
        tail = os.path.basename(p).split("=", 1)[1]
        if tail.isdigit():
            out.append(int(tail))
    return sorted(out)


def snapshot_current_version(table_dir: str) -> int | None:
    """The committed version the pointer names (None before any publish).
    A leftover _CURRENT.tmp from a crashed publish is ignored — only the
    atomic replace commits."""
    import json
    import os

    ptr = os.path.join(table_dir, _SNAPSHOT_PTR)
    if not os.path.exists(ptr):
        return None
    with open(ptr, encoding="utf-8") as fh:
        return int(json.load(fh)["version"])


def publish_snapshot(df: DataFrame, table_dir: str) -> int:
    """Write ``df`` as the next immutable version and atomically flip the
    pointer to it. Returns the published version number. Crash-safe at
    every step (see the protocol note above). Recovery-first: any on-disk
    dir beyond the pointer is a crashed publish's garbage and is DELETED
    before numbering — if it merely stayed, it would become spuriously
    readable as a committed version once this publish flips the pointer
    past its number. Single-maintenance-writer contract (same as the CM
    compactor): concurrent publishers would see each other's in-progress
    dirs as crash garbage."""
    import json
    import os
    import shutil

    os.makedirs(table_dir, exist_ok=True)
    cur = snapshot_current_version(table_dir) or 0
    for orphan in _snapshot_dir_versions(table_dir):
        if orphan > cur:
            shutil.rmtree(
                os.path.join(table_dir, f"v={orphan}"), ignore_errors=True
            )
    n = cur + 1
    df.write.mode("overwrite").parquet(os.path.join(table_dir, f"v={n}"))
    ptr = os.path.join(table_dir, _SNAPSHOT_PTR)
    tmp = ptr + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump({"version": n}, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, ptr)  # the commit point
    return n


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read the current version (default) or an older retained version
    (time travel / as-of read). An on-disk dir whose number exceeds the
    pointer is an UNCOMMITTED crashed publish and is refused — commit
    state lives in the pointer alone."""
    import os

    cur = snapshot_current_version(table_dir)
    if cur is None:
        raise FileNotFoundError(
            f"{table_dir} has no committed snapshot (no {_SNAPSHOT_PTR});"
            " publish_snapshot first"
        )
    v = cur if version is None else int(version)
    if v > cur:
        raise ValueError(
            f"version {v} is not committed (current = {cur}); an on-disk"
            " v= dir beyond the pointer is a crashed publish, not data"
        )
    path = os.path.join(table_dir, f"v={v}")
    if not os.path.isdir(path):
        raise ValueError(
            f"version {v} is not retained (vacuumed); available:"
            f" {[x for x in _snapshot_dir_versions(table_dir) if x <= cur]}"
        )
    return spark.read.parquet(path)


def vacuum_snapshots(table_dir: str, keep_last: int = 2) -> list[int]:
    """Remove old committed versions beyond the ``keep_last`` most recent,
    plus any uncommitted orphan dirs from crashed publishes. Returns the
    removed version numbers. The current version is always kept."""
    import os
    import shutil

    cur = snapshot_current_version(table_dir)
    if cur is None:
        return []
    committed = [v for v in _snapshot_dir_versions(table_dir) if v <= cur]
    orphans = [v for v in _snapshot_dir_versions(table_dir) if v > cur]
    drop = [v for v in committed if v < cur][: max(0, len(committed) - keep_last)]
    removed = sorted(drop + orphans)
    for v in removed:
        shutil.rmtree(os.path.join(table_dir, f"v={v}"), ignore_errors=True)
    return removed


def merge_snapshot(
    spark: SparkSession,
    table_dir: str,
    changes: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str = "op",
) -> int:
    """MERGE INTO a snapshot-versioned table: roll the CURRENT version
    forward by a changelog (operators/cdc.py::apply_changelog — the
    law-tested latest-wins upsert/delete) and publish the result as the
    next version, atomically. Readers of the old version are untouched
    (version isolation across the merge — the property the
    snapshot_merge_state gate pins); a crash mid-merge leaves the old
    version current (publish_snapshot's pointer protocol).

    This is the warehouse maintenance loop composed end-to-end: nightly
    CDC batch -> MERGE -> new immutable version, with time travel back
    across merges and vacuum retention. Returns the new version."""
    from ..operators.cdc import apply_changelog

    merged = apply_changelog(
        read_snapshot(spark, table_dir), changes, key_cols, seq_cols, op_col
    )
    return publish_snapshot(merged, table_dir)
