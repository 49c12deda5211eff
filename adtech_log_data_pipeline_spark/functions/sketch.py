"""Mergeable cardinality sketches — the approximate-distinct layer a
100 TB pipeline uses where exact countDistinct state would grow with
cardinality (reference parity: the reference's exact per-key distinct
counts, AppProfiles.java:48-133, stay exact; THIS module is the
documented scale path for global/rollup cardinalities).

KMV (k-minimum-values, Bar-Yossef et al. 2002, public) instead of
HyperLogLog: Spark's approx_count_distinct and DuckDB's approx HLLs are
different implementations and can never hash-match across engines,
while KMV over an explicit md5-derived 48-bit hash is bit-reproducible
everywhere — the estimator is (k-1)/h_k with h_k the k-th smallest
normalized hash, all single IEEE ops on integer-exact inputs.

Scale shape: one DISTINCT-hash aggregation (map-side combining; state
per group is bounded by the distinct count ONLY until the per-group
top-k filter — at 100 TB swap the exact distinct for a per-partition
bounded min-k partial via the same hash, which the banded window below
already models at k rows/group) followed by a k-row window. The sketch
rows (group, kth_hash) are MERGEABLE: union two sketches' kept-hash
relations, re-take the k smallest, same estimator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

KMV_K = 64
HASH_HEX_CHARS = 12  # 48 bits: exact in a double, fits bigint in DuckDB
HASH_SPACE = float(1 << 48)


def kmv_hash(col: str, salt: str = "kmv") -> F.Column:
    """48-bit integer hash of a column value: first 12 hex chars of
    md5('{salt}:' || value). Identical in DuckDB as
    ('0x' || substr(md5(...), 1, 12))::BIGINT."""
    return F.expr(
        f"cast(conv(substr(md5(concat('{salt}:', cast({col} as string))),"
        f" 1, {HASH_HEX_CHARS}), 16, 10) as bigint)"
    )


def kmv_distinct(
    df: DataFrame,
    col: str,
    group_cols: list[str],
    k: int = KMV_K,
    salt: str = "kmv",
) -> DataFrame:
    """Per-group KMV distinct-count sketch:
    (group_cols..., n_kept, kth_hash, est_distinct).

    n_kept is min(k, distinct hashes); when the group holds fewer than k
    distinct values the estimate IS the exact count (the sketch kept
    every hash). Determinism: the hash is integer-exact; the estimator
    divides (k-1) by kth_hash/2^48 — the normalization is an exact
    power-of-two scale and the final divide is one IEEE op, so Spark and
    DuckDB agree bit-for-bit (rounded to 1e-6 by convention)."""
    # NULLs are excluded (the usual distinct-count convention — and the
    # engines disagree on NULL sort position, so a NULL hash would break
    # cross-engine row_number determinism)
    d = (
        df.filter(F.col(col).isNotNull())
        .select(*group_cols, kmv_hash(col, salt).alias("h"))
        .distinct()
    )
    return kmv_report(kmv_keep(d, group_cols, k), group_cols, k)


def kmv_keep(hashes: DataFrame, group_cols: list[str], k: int = KMV_K) -> DataFrame:
    """The sketch STATE: the k smallest distinct hashes per group from a
    (group_cols..., h) relation. Idempotent and mergeable — kmv_keep over
    a union of kept states equals kmv_keep over the union of the raw
    hash relations (each state contains its side's k smallest)."""
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashes.distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_report(kept: DataFrame, group_cols: list[str], k: int = KMV_K) -> DataFrame:
    """Estimator over a kept-hash state: (group..., n_kept, kth_hash,
    est_distinct)."""
    return kept.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("int").alias("n_kept"),
        F.max("h").alias("kth_hash"),
    ).select(
        *group_cols,
        "n_kept",
        "kth_hash",
        F.round(
            F.when(
                F.col("n_kept") < k, F.col("n_kept").cast("double")
            ).otherwise(
                F.lit(float(k - 1)) / (F.col("kth_hash") / F.lit(HASH_SPACE))
            ),
            6,
        ).alias("est_distinct"),
    )
