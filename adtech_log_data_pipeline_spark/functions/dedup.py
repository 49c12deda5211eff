"""Deduplication operators over the `documents` table — exact, MinHash+LSH,
SimHash, and n-gram Jaccard (BASELINE.json north star).

Scale design notes (the point of each variant at 100 TB):
  * exact/set-hash dedup: one hash-groupBy — map-side partial agg, single
    shuffle on the 16-byte hash, no text movement beyond the hash.
  * MinHash+LSH: per-doc signature is a map-only pass (shingle -> k mins);
    the only shuffle is the band-bucket join, which touches candidate
    PAIRS only — never the O(n^2) cross product.
  * SimHash: map-only 16-bit signature; near-dup lookup becomes an
    equi-join on the signature (or signatures at Hamming distance <= 1).
  * n-gram Jaccard: exact verification, run only on blocked/candidate
    pairs for exactly that reason.

Hash functions are md5-based so the DuckDB oracle can restate them
verbatim; no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens_col

N_PERM = 16  # MinHash permutations
N_BANDS = 4  # LSH bands -> r = N_PERM / N_BANDS = 4 rows per band
SHINGLE = 3  # word-shingle width
SIMHASH_BITS = 16


def dedup_exact(documents: DataFrame) -> DataFrame:
    """Exact + set-hash dedup groups: one row per content group with the
    canonical survivor (min doc_id) and the group size. `vocab_hash`
    groups documents with an identical distinct-token set (cheap
    order-insensitive near-dup)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    toks = tokens_col()
    hashed = documents.select(
        "doc_id",
        F.md5(norm.cast("binary")).alias("content_hash"),
        F.md5(
            F.concat_ws("\x1f", F.array_sort(F.array_distinct(toks))).cast("binary")
        ).alias("vocab_hash"),
    )
    return hashed.groupBy("vocab_hash").agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).cast("int").alias("group_size"),
        F.countDistinct("content_hash").cast("int").alias("distinct_texts"),
    )


def _shingles() -> F.Column:
    """Word 3-gram shingles from `toks` (array column in scope). Documents
    shorter than the shingle width contribute their full token join."""
    return F.expr(
        f"""
        CASE WHEN size(toks) < {SHINGLE}
             THEN array(concat_ws(' ', toks))
             ELSE transform(sequence(1, size(toks) - {SHINGLE - 1}),
                            i -> concat_ws(' ', slice(toks, i, {SHINGLE})))
        END
        """
    )


def minhash_signatures(documents: DataFrame) -> DataFrame:
    """(doc_id, sig array<string> of N_PERM minhashes). Permutation i is
    simulated by keying md5 with the permutation index: min(md5(i||#||s))
    over shingles — the standard seeded-hash MinHash construction."""
    d = documents.select("doc_id", tokens_col().alias("toks")).select(
        "doc_id", _shingles().alias("shingles")
    )
    sig = F.expr(
        f"""
        transform(sequence(0, {N_PERM - 1}),
                  p -> array_min(transform(shingles,
                       s -> md5(cast(concat(cast(p as string), '#', s) as binary)))))
        """
    )
    return d.select("doc_id", sig.alias("sig"))


def minhash_candidates(documents: DataFrame) -> DataFrame:
    """LSH banding: docs sharing any band of 4 consecutive signature slots
    are near-dup candidates. Output: distinct (doc_a, doc_b) with
    doc_a < doc_b. The self-join shuffles on the band hash — bucket sizes,
    not the corpus, drive the cost."""
    sigs = minhash_signatures(documents)
    r = N_PERM // N_BANDS
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"""
                transform(sequence(0, {N_BANDS - 1}),
                          b -> struct(b AS band,
                                      md5(cast(concat_ws('|', slice(sig, b * {r} + 1, {r})) as binary)) AS key))
                """
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    left = bands.alias("l")
    right = bands.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )
    return pairs


def simhash(documents: DataFrame) -> DataFrame:
    """16-bit SimHash over tokens: bit b of the signature is set when the
    sum of (+1/-1) votes from each token's 16-bit hash is non-negative.
    Pure column expressions — the per-bit votes are a fold over the token
    array, no explode, no shuffle."""
    h16 = "cast(conv(substr(md5(cast(t as binary)), 1, 4), 16, 10) as int)"
    # shiftright() function, not the >> operator — Spark's SQL parser
    # rejects >> inside higher-order-function lambdas
    bit_votes = ", ".join(
        f"aggregate(toks, 0, (a, t) -> a + (CASE WHEN (shiftright({h16}, {b}) & 1) = 1 THEN 1 ELSE -1 END))"
        for b in range(SIMHASH_BITS)
    )
    d = documents.select("doc_id", tokens_col().alias("toks"))
    d = d.select("doc_id", F.expr(f"array({bit_votes})").alias("votes"))
    assemble = F.expr(
        f"aggregate(sequence(0, {SIMHASH_BITS - 1}), 0,"
        " (acc, b) -> acc + (CASE WHEN votes[b] >= 0 THEN shiftleft(1, b) ELSE 0 END))"
    )
    return d.select("doc_id", assemble.cast("int").alias("simhash"))


def ngram_jaccard_pairs(
    documents: DataFrame, candidates: DataFrame | None = None, threshold: float = 0.0
) -> DataFrame:
    """Exact Jaccard similarity over distinct word-3-gram sets for candidate
    pairs (from minhash_candidates by default). Output:
    (doc_a, doc_b, inter_size, union_size, jaccard)."""
    if candidates is None:
        candidates = minhash_candidates(documents)
    shingle_sets = documents.select("doc_id", tokens_col().alias("toks")).select(
        "doc_id", F.array_distinct(_shingles()).alias("sh")
    )
    a = shingle_sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = shingle_sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    joined = candidates.join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    out = joined.select(
        "doc_a",
        "doc_b",
        inter.alias("inter_size"),
        union.alias("union_size"),
        (inter / union).alias("jaccard"),
    )
    if threshold > 0:
        out = out.filter(F.col("jaccard") >= threshold)
    return out
