"""Skew-resistant aggregation — the salting pattern for hot keys
(SURVEY.md §4 scale notes: "salt the bundle aggregation if app popularity
is skewed"; AQE skew-join handles joins, but a single hot GROUP BY key
still funnels into one reducer for non-algebraic aggregates).

``salted_count_distinct`` demonstrates the two-phase shape for the
engine's hottest real case — distinct users per (possibly viral) app:

  phase 1: groupBy(key, salt = hash(value) % n) -> partial distinct count
           (each hot key spreads over n reducers; distinct sets are
           disjoint across salts BECAUSE the salt is derived from the
           value, so phase 2 may simply SUM)
  phase 2: groupBy(key) -> sum of partial counts

For algebraic aggregates (sum/count/min/max) Spark's built-in partial
aggregation already neutralizes skew; salting matters exactly for
distinct-style state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_distinct(
    df: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    n_salts: int = 16,
    alias: str = "n_distinct",
) -> DataFrame:
    """Exact distinct count of `value_cols` tuples per `key_cols` group,
    skew-spread over `n_salts` reducers. Equivalent to
    groupBy(keys).agg(countDistinct(values)) for any input (test-checked);
    use when a handful of keys hold a large share of the rows."""
    salt: Column = F.pmod(F.hash(*[F.col(c) for c in value_cols]), F.lit(n_salts))
    partial = (
        df.select(*key_cols, *value_cols)
        .withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.countDistinct(*value_cols).alias("_partial"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("_partial").alias(alias))


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-spread equi-join for a too-big-to-broadcast build side with hot
    keys: fact rows get a random-ish salt derived from the WHOLE row hash
    (deterministic, no rand() — rerun-stable), the dim side replicates
    once per salt, and the join keys on (key, salt) so one hot key spreads
    over ``n_salts`` reducers instead of funneling into one.

    Use when AQE's skew-join split can't help: AQE splits oversized
    PARTITIONS after the shuffle, but a single key whose hash bucket
    exceeds every split threshold (or a sort-merge join disabled by AQE
    constraints) still hot-spots. Cost: the dim side shuffles n_salts x
    its size — only worth it for dimension tables well under the fact's
    hot-key mass. `how` supports inner/left (the salted dim is a pure
    replication, so multiplicity is preserved exactly).

    Equivalence to the plain join is test-checked for every `how`."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    fact_cols = [c for c in facts.columns]
    salt = F.pmod(F.hash(*[F.col(c) for c in fact_cols]), F.lit(n_salts))
    f = facts.withColumn("_salt", salt)
    d = dim.crossJoin(
        F.broadcast(
            facts.sparkSession.range(n_salts).select(
                F.col("id").cast("int").alias("_salt")
            )
        )
    )
    out = f.join(d, [key, "_salt"], how)
    return out.drop("_salt")
