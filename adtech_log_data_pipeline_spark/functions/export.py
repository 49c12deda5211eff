"""Training-shard export — the sink end of the curation pipeline: write the
curated corpus as split-partitioned parquet plus a manifest, the layout a
downstream trainer consumes.

Scale shape: `partitionBy("split")` gives hive-style directories; rows are
routed by a repartition on the partition column (one shuffle) so each
output task writes exactly one split directory instead of every task
writing three small files — the small-files problem is a layout decision,
made here. `sortWithinPartitions(doc_id)` makes shard contents
deterministic and gives parquet row-group min/max stats a monotone doc_id
for later range pruning. The manifest is computed from the same curated
relation (no post-hoc directory listing) so it is consistent by
construction.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_training_shards(
    documents: DataFrame,
    out_dir: str,
    curated: DataFrame | None = None,
) -> DataFrame:
    """Write curated documents to ``out_dir`` partitioned by split and
    return the manifest DataFrame (split, n_docs, n_tokens, n_sources).

    ``curated`` defaults to functions.text.curated_corpus(documents); a
    caller-supplied ``curated`` is used AS GIVEN — its persistence is the
    caller's decision, and export never unpersists it (unpersist is not
    reference-counted, so releasing a shared frame would silently drop a
    composing pipeline's cache)."""
    from ._cache import hold, registry_mark, release_cached_from

    # mark BEFORE building the default curated plan: any frames
    # curated_corpus holds internally belong to this export's scope
    mark = registry_mark()
    if curated is None:
        from .text import curated_corpus

        # export owns this frame: persist it for the two consumers below
        curated = hold(curated_corpus(documents))
    try:
        rows = documents.join(
            curated.select("doc_id", "split", "n_tokens"), "doc_id"
        )
        (
            rows.repartition("split")
            .sortWithinPartitions("doc_id")
            .write.partitionBy("split")
            .mode("overwrite")
            .parquet(os.path.join(out_dir, "shards"))
        )
        manifest = curated.groupBy("split").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.countDistinct("source").alias("n_sources"),
        )
        manifest.coalesce(1).write.mode("overwrite").json(
            os.path.join(out_dir, "manifest")
        )
    finally:
        # both consumers (shard write + manifest json) have executed; a
        # long-lived session must not keep export-owned relations cached
        # (a later collect on the returned manifest just recomputes).
        # SCOPED release: only frames registered since the mark — i.e.
        # export's own default-curated chain; a caller-supplied frame was
        # never registered here and stays cached.
        release_cached_from(mark)
    return manifest
