"""Explicit bloom semi-join reduction — pre-filter a huge fact table by a
compact bitmap of the dim side's join keys BEFORE the shuffle.

The 100 TB shape this exists for: the filtered dim side is too large to
broadcast as a TABLE (tens of millions of keys), so the join must shuffle
both sides — but its key set compresses into a few KB..MB bloom bitmap
that CAN ride to every fact partition as a plan literal. Probing the
bitmap map-side drops most non-matching fact rows before they are
serialized into the exchange, turning a full-fact shuffle into a
matching-rows shuffle. False positives only cost shuffle bytes — the real
join still verifies every survivor, so the RESULT is bit-identical to the
plain join (which is exactly how the driver's oracle states it).

Spark's own runtime bloom (spark.sql.optimizer.runtime.bloomFilter.*) and
AQE can inject a similar filter when statistics allow; this operator makes
the reduction explicit, deterministic, and observable (bloom_selectivity
reports how many fact rows the bitmap admitted).

Everything stays in codegen: xxhash64 probes, element_at against the
bitmap array literal, bit_or hash agg on the build side. The only driver
touch is collecting the n_words (default 2048) packed rows — the same
bounded k-row pattern as the IVF/k-means centroid collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Default bitmap: 2048 packed int64 words = 131072 bits. Size ~10 bits per
# build-side key at scale (n_words ~= n_keys * 10 / 64); FP rate with two
# probes is (1 - e^(-2n/m))^2 — and a high FP rate degrades only shuffle
# savings, never correctness.
BLOOM_WORDS = 2048

# Signed-int64 power table: index b holds the 1<<b bit pattern (b=63 wraps
# to the sign bit). element_at lookup replaces shiftleft-by-column, which
# Spark's function API only offers for literal shift amounts.
_POW2 = [(1 << b) if b < 63 else (1 << 63) - (1 << 64) for b in range(64)]

_N_PROBES = 2


def _positions(key: Column, m: int) -> list[Column]:
    """The probe bit positions of a key: seeded xxhash64, pmod m."""
    return [
        F.pmod(F.xxhash64(F.lit(seed), key), F.lit(m))
        for seed in range(1, _N_PROBES + 1)
    ]


def bloom_build(keys: DataFrame, key_col: str, n_words: int = BLOOM_WORDS) -> list[int]:
    """Aggregate the build side's keys into a packed int64 bitmap.

    Map-side: each key emits its probe positions; one bit_or hash agg
    packs them into at most n_words (word_idx, bits) rows, collected and
    densified on the driver (bounded by n_words, not by key count)."""
    m = n_words * 64
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key_col), m))).alias("pos")
    )
    packed = (
        pos.select(
            F.shiftright("pos", 6).cast("int").alias("w"),
            F.element_at(
                F.lit(_POW2), F.col("pos").bitwiseAND(F.lit(63)).cast("int") + 1
            ).alias("mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    words = [0] * n_words
    for r in packed:
        words[r["w"]] = r["bits"]
    return words


def bloom_might_contain(key: Column, words: list[int]) -> Column:
    """Map-side membership probe against a built bitmap: true for every
    key that was in the build set (plus false positives), pure codegen."""
    m = len(words) * 64
    lit_words = F.lit(words)
    hit = F.lit(True)
    for pos in _positions(key, m):
        word = F.element_at(lit_words, F.shiftright(pos, 6).cast("int") + 1)
        mask = F.element_at(
            F.lit(_POW2), pos.bitwiseAND(F.lit(63)).cast("int") + 1
        )
        hit = hit & (word.bitwiseAND(mask) != 0)
    return hit


def bloom_pruned_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    n_words: int = BLOOM_WORDS,
) -> DataFrame:
    """Inner equi-join with the fact side pre-filtered through the dim
    side's key bloom. Result rows are exactly the plain join's — the
    bitmap admits a superset of matching keys and the join removes the
    false positives."""
    words = bloom_build(dim.select(key), key, n_words=n_words)
    pruned = facts.filter(bloom_might_contain(F.col(key), words))
    return pruned.join(dim, key, "inner")


def bloom_selectivity(
    facts: DataFrame, dim: DataFrame, key: str, n_words: int = BLOOM_WORDS
) -> tuple[int, int]:
    """Observability companion: (fact rows admitted by the bitmap, total
    fact rows) — what the reduction actually saved in shuffle rows."""
    words = bloom_build(dim.select(key), key, n_words=n_words)
    row = facts.select(
        F.count(F.lit(1)).alias("total"),
        F.sum(
            bloom_might_contain(F.col(key), words).cast("bigint")
        ).alias("admitted"),
    ).collect()[0]
    return int(row["admitted"]), int(row["total"])
