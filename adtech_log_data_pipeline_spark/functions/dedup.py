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

from ._cache import hold, register
from .text import tokens_col

N_PERM = 16  # MinHash permutations
N_BANDS = 4  # LSH bands -> r = N_PERM / N_BANDS = 4 rows per band
SHINGLE = 3  # word-shingle width
SIMHASH_BITS = 16
# Degenerate-bucket guardrail: membership of a single (band, key) bucket is
# capped (keep-rule: smallest doc_ids) so an adversarial corpus of identical
# documents stays bucket-local O(cap^2) instead of O(n^2). The DuckDB oracle
# states the identical cap; no real bucket approaches it on honest data.
BAND_BUCKET_CAP = 500

#: manifest family tag for the bands+shingles artifact (_index_commit)
DEDUP_INDEX_FAMILY = "dedup"


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


def dedup_keep_best(documents: DataFrame) -> DataFrame:
    """Representative selection — the dedup POLICY half of exact dedup:
    within each normalized-content group keep the document with the
    longest RAW text (most formatting/casing preserved), tie broken by
    smallest doc_id. Output one row per document:
    (doc_id, content_hash, group_size, keep) — training pipelines filter
    `keep` and keep lineage via content_hash.

    Scale shape: one shuffle on content_hash; the two window passes ride
    the same partitioning (groups are tiny — raw dup multiplicity — so
    per-partition sorts are bounded)."""
    from pyspark.sql.window import Window

    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    hashed = documents.select(
        "doc_id",
        F.md5(norm.cast("binary")).alias("content_hash"),
        F.length("text").alias("raw_len"),
    )
    w = Window.partitionBy("content_hash").orderBy(
        F.col("raw_len").desc(), F.col("doc_id")
    )
    g = Window.partitionBy("content_hash")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .withColumn("group_size", F.count(F.lit(1)).over(g).cast("int"))
        .select(
            "doc_id",
            "content_hash",
            "group_size",
            (F.col("rn") == 1).alias("keep"),
        )
    )


def _shingles() -> F.Column:
    """Word 3-gram shingles from `toks` (array column in scope). Documents
    shorter than the shingle width contribute their full token join.
    Interpreted higher-order form — kept for array-shaped callers; the hot
    path uses _shingle_rows (codegen window formulation, ~5x faster)."""
    return F.expr(
        f"""
        CASE WHEN size(toks) < {SHINGLE}
             THEN array(concat_ws(' ', toks))
             ELSE transform(sequence(1, size(toks) - {SHINGLE - 1}),
                            i -> concat_ws(' ', slice(toks, i, {SHINGLE})))
        END
        """
    )


def _shingle_rows_with_pos(documents: DataFrame) -> DataFrame:
    """(doc_id, pos, s) shingle rows with 0-based positions — winnowing and
    other order-aware consumers. Same construction as _shingle_rows."""
    from pyspark.sql.window import Window

    n_parts = documents.sparkSession.sparkContext.defaultParallelism
    d = documents.repartition(n_parts, "doc_id").select(
        "doc_id", tokens_col().alias("toks")
    )
    tok = d.filter(F.size("toks") >= SHINGLE).select(
        "doc_id", F.posexplode("toks").alias("pos", "t")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    long_docs = (
        tok.withColumn("t2", F.lead("t", 1).over(w))
        .withColumn("t3", F.lead("t", 2).over(w))
        .filter(F.col("t3").isNotNull())
        .select("doc_id", "pos", F.concat_ws(" ", "t", "t2", "t3").alias("s"))
    )
    short_docs = d.filter(F.size("toks") < SHINGLE).select(
        "doc_id", F.lit(0).alias("pos"), F.concat_ws(" ", "toks").alias("s")
    )
    return long_docs.unionByName(short_docs)


def _shingle_rows(documents: DataFrame) -> DataFrame:
    """(doc_id, s) shingle rows — posexplode + lead() window, all codegen.
    Identical shingle multiset to _shingles(); short docs (<3 tokens) emit
    their full token join as the single shingle. The documents table often
    arrives as one fat parquet partition, so spread the CPU-bound work
    first."""
    from pyspark.sql.window import Window

    n_parts = documents.sparkSession.sparkContext.defaultParallelism
    d = documents.repartition(n_parts, "doc_id").select(
        "doc_id", tokens_col().alias("toks")
    )
    tok = d.filter(F.size("toks") >= SHINGLE).select(
        "doc_id", F.posexplode("toks").alias("pos", "t")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    long_docs = (
        tok.withColumn("t2", F.lead("t", 1).over(w))
        .withColumn("t3", F.lead("t", 2).over(w))
        .filter(F.col("t3").isNotNull())
        .select("doc_id", F.concat_ws(" ", "t", "t2", "t3").alias("s"))
    )
    short_docs = d.filter(F.size("toks") < SHINGLE).select(
        "doc_id", F.concat_ws(" ", "toks").alias("s")
    )
    return long_docs.unionByName(short_docs)


def minhash_signatures(
    documents: DataFrame, shingles: DataFrame | None = None
) -> DataFrame:
    """(doc_id, sig array<string> of N_PERM minhashes). Permutation i is
    simulated by keying md5 with the permutation index: min(md5(i||#||s))
    over shingles — the standard seeded-hash MinHash construction.

    Shape: explode shingles -> one codegen HashAggregate with N_PERM min()
    columns -> re-assemble the array. Higher-order-function lambdas are
    interpreted row-at-a-time in Spark (no codegen) — the exploded
    formulation is ~20x faster at sf0.1 for identical output.

    ``shingles`` lets a caller that already materialized the (doc_id, s)
    relation share it (min over a multiset equals min over its support
    set, so distinct vs raw shingle rows are interchangeable here)."""
    sh = (shingles if shingles is not None else _shingle_rows(documents)).select(
        "doc_id",
        # 2 md5 evaluations per shingle feed all N_PERM permutations via the
        # standard tabulation family h_p(s) = (a + p*b) mod PRIME — 8x less
        # hashing than per-permutation keyed md5, and integer mins beat
        # string mins in the aggregate buffers
        F.expr("cast(conv(substr(md5(cast(s as binary)), 1, 8), 16, 10) as bigint)").alias("ha"),
        F.expr(
            "1 + cast(conv(substr(md5(cast(concat('x', s) as binary)), 1, 8), 16, 10) as bigint)"
        ).alias("hb"),
    )
    prime = 4294967291  # largest 32-bit prime
    mins = [
        F.min((F.col("ha") + F.lit(p) * F.col("hb")) % F.lit(prime)).alias(f"m{p}")
        for p in range(N_PERM)
    ]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id", F.array(*[F.col(f"m{p}") for p in range(N_PERM)]).alias("sig")
    )


def _minhash_band_rows_raw(
    documents: DataFrame, shingles: DataFrame | None = None
) -> DataFrame:
    """UNCAPPED (doc_id, band, key) band-bucket membership — the raw LSH
    index relation before the degenerate-bucket cap. Shared by the capped
    index (minhash_band_rows) and the cap audit (band_cap_audit)."""
    sigs = minhash_signatures(documents, shingles=shingles)
    r = N_PERM // N_BANDS
    return sigs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"""
                transform(sequence(0, {N_BANDS - 1}),
                          b -> struct(b AS band,
                                      md5(cast(concat_ws('|', transform(slice(sig, b * {r} + 1, {r}), x -> cast(x as string))) as binary)) AS key))
                """
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")


def minhash_band_rows(
    documents: DataFrame,
    bucket_cap: int = BAND_BUCKET_CAP,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """The capped (doc_id, band, key) band-bucket membership relation —
    the LSH *index* a 100 TB deployment persists between ingests (here
    persisted for the duration of the query via functions/_cache.py).
    Bucket membership beyond ``bucket_cap`` (keep-rule: smallest doc_ids)
    is dropped so a degenerate corpus bounds pair generation at
    O(cap^2) per bucket; HOW MUCH each band dropped is observable via
    band_cap_audit (the "no silent caps" rule). Held lazily (r13): the
    first consumer's action fills the cache, and concurrent fills are
    per-partition-serialized by the block manager — see hold()."""
    from pyspark.sql.window import Window

    wcap = Window.partitionBy("band", "key").orderBy("doc_id")
    bands = hold(
        _minhash_band_rows_raw(documents, shingles=shingles)
        .withColumn("rn", F.row_number().over(wcap))
        .filter(F.col("rn") <= bucket_cap)
        .drop("rn"),
    )
    return bands


def minhash_candidates(
    documents: DataFrame,
    bucket_cap: int = BAND_BUCKET_CAP,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """LSH banding: docs sharing any band of 4 consecutive signature slots
    are near-dup candidates. Output: distinct (doc_a, doc_b) with
    doc_a < doc_b. The self-join shuffles on the band hash — bucket sizes,
    not the corpus, drive the cost (see minhash_band_rows for the cap)."""
    bands = minhash_band_rows(documents, bucket_cap=bucket_cap, shingles=shingles)
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
    # explode tokens -> md5 ONCE per token -> 16 codegen sum() vote columns
    # (per-bit lambda folds would be interpreted and recompute the hash 16x)
    toks = documents.select("doc_id", F.explode(tokens_col()).alias("t")).select(
        "doc_id",
        F.expr(
            "cast(conv(substr(md5(cast(t as binary)), 1, 4), 16, 10) as int)"
        ).alias("h"),
    )
    votes = [
        F.sum(
            F.when(F.expr(f"(shiftright(h, {b}) & 1) = 1"), 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    assemble = sum(
        F.when(F.col(f"v{b}") >= 0, F.lit(1 << b)).otherwise(F.lit(0))
        for b in range(SIMHASH_BITS)
    )
    return agg.select("doc_id", assemble.cast("int").alias("simhash"))


# Adaptive cutoff for connected components: below this many (deduplicated,
# undirected) edges the graph is collected and solved with driver-side
# union-find — the broadcast-join analogue for iterative algorithms. A
# candidate-pair graph is usually SMALL even on a huge corpus (LSH bucketing
# already reduced it to near-dup pairs); 2M edges ≈ 32 MB of longs on the
# driver, far below what each label-propagation ROUND would shuffle anyway.
# Above the cutoff the distributed pointer-jumping loop takes over.
DRIVER_CC_MAX_EDGES = 2_000_000


def _union_find_components(edge_rows) -> list:
    """Driver-side union-find with path compression; returns (doc_id, label)
    pairs with component label = min doc_id of the component."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for src, dst in edge_rows:
        if src not in parent:
            parent[src] = src
        if dst not in parent:
            parent[dst] = dst
        ra, rb = find(src), find(dst)
        if ra != rb:
            # union by min so the root IS the component minimum
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return [(x, find(x)) for x in parent]


# 60-bit SimHash for the Hamming-distance near-dup join (15 md5 hex chars
# keeps the value positive in a signed 64-bit int in BOTH dialects; the
# 16-bit variant above stays the compact signature column). 4 pieces of 15
# bits: by pigeonhole, any pair at Hamming distance <= 3 matches on at
# least one piece — the classic Manku/Jain/Sarma banding scheme.
SIMHASH64_BITS = 60
SIMHASH64_PIECES = 4
_PIECE_BITS = SIMHASH64_BITS // SIMHASH64_PIECES  # 15
_PIECE_MASK = (1 << _PIECE_BITS) - 1


def simhash64(documents: DataFrame) -> DataFrame:
    """(doc_id, simhash64 bigint) — 60-bit SimHash over tokens; same
    vote construction as simhash(), one md5 per token, all codegen.

    The +1/-1 vote for bit b is folded algebraically: vote_sum(b) =
    2*ones(b) - n_tokens, so bit b is set iff 2*sum((h>>b)&1) >= count —
    the sum expressions stay tiny (no CASE per bit), which matters for
    codegen compile time with 60 aggregate buffers."""
    toks = documents.select("doc_id", F.explode(tokens_col()).alias("t")).select(
        "doc_id",
        F.expr(
            "cast(conv(substr(md5(cast(t as binary)), 1, 15), 16, 10) as bigint)"
        ).alias("h"),
    )
    ones = [
        F.sum(F.expr(f"shiftright(h, {b}) & 1")).alias(f"s{b}")
        for b in range(SIMHASH64_BITS)
    ]
    agg = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("cnt"), *ones)
    assemble = sum(
        F.when(F.col(f"s{b}") * 2 >= F.col("cnt"), F.lit(1 << b)).otherwise(F.lit(0))
        for b in range(SIMHASH64_BITS)
    )
    return agg.select("doc_id", assemble.cast("bigint").alias("simhash64"))


def _simhash_piece_rows_raw(documents: DataFrame) -> DataFrame:
    """UNCAPPED (doc_id, simhash64, piece, pval) piece-bucket membership —
    the raw banding relation before the degenerate-bucket cap. Shared by
    simhash_near_dup and the cap audit (band_cap_audit)."""
    return simhash64(documents).select(
        "doc_id",
        "simhash64",
        F.explode(
            F.expr(
                f"""
                transform(sequence(0, {SIMHASH64_PIECES - 1}),
                          p -> struct(p AS piece,
                                      (shiftright(simhash64, p * {_PIECE_BITS}) & {_PIECE_MASK}) AS pval))
                """
            )
        ).alias("pk"),
    ).select("doc_id", "simhash64", "pk.piece", "pk.pval")


def band_cap_audit(
    documents: DataFrame,
    bucket_cap: int = BAND_BUCKET_CAP,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Cap-pressure audit over BOTH banding schemes — the "no silent caps"
    rule (the reference's tripwire philosophy, D/CorruptedDataException:
    fail loud, never silently degrade): bucket membership beyond
    ``bucket_cap`` is dropped by minhash_band_rows / simhash_near_dup,
    and THIS relation reports exactly how much, per band.

    Output: one row per (scheme, band) —
    (scheme, band, n_buckets, n_capped_buckets, n_members, n_dropped,
    max_bucket). On an honest corpus n_capped_buckets = n_dropped = 0;
    on a boilerplate-heavy 100 TB crawl a non-zero n_dropped is the
    signal that near-dup recall is being truncated and the cap (or the
    shingling) needs attention.

    Scale shape: two (band, key) hash aggs + two tiny per-band rollups —
    the same single shuffle the banding join itself pays; no pair
    generation anywhere."""
    cap = F.lit(bucket_cap)

    def per_band(rows: DataFrame, band_col: str, key_col: str, scheme: str) -> DataFrame:
        per_bucket = rows.groupBy(band_col, key_col).agg(
            F.count(F.lit(1)).alias("n")
        )
        return per_bucket.groupBy(F.col(band_col).cast("int").alias("band")).agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(F.when(F.col("n") > cap, 1).otherwise(0)).alias(
                "n_capped_buckets"
            ),
            F.sum("n").alias("n_members"),
            F.sum(F.greatest(F.col("n") - cap, F.lit(0))).alias("n_dropped"),
            F.max("n").cast("int").alias("max_bucket"),
        ).select(F.lit(scheme).alias("scheme"), "*")

    mh = per_band(
        _minhash_band_rows_raw(documents, shingles=shingles),
        "band",
        "key",
        "minhash_band",
    )
    sh = per_band(
        _simhash_piece_rows_raw(documents), "piece", "pval", "simhash_piece"
    )
    return mh.unionByName(sh)


def simhash_near_dup(
    documents: DataFrame, max_hamming: int = 3, bucket_cap: int = BAND_BUCKET_CAP
) -> DataFrame:
    """Near-dup pairs at Hamming distance <= max_hamming between 60-bit
    SimHash signatures. Candidate generation is the piece-banding join
    (pairs sharing any of the 4 15-bit pieces — exhaustive for distance
    <= 3 by pigeonhole); verification is a single codegen
    bit_count(xor) per candidate pair. Output: (doc_a, doc_b, hamming).

    Scale shape mirrors minhash_candidates: the only shuffle keys on the
    (piece, value) bucket, bucket membership is capped against degenerate
    corpora, and the signature relation is persisted so the vote
    aggregation runs once for both join sides."""
    from pyspark.sql.window import Window

    wcap = Window.partitionBy("piece", "pval").orderBy("doc_id")
    # the signature rides along in the piece relation, so the verify is a
    # single bit_count inside the bucket join — no join-back to the
    # signature table. Persisted: it feeds BOTH sides of the self-join.
    # Drops past ``bucket_cap`` are observable via band_cap_audit.
    pieces = hold(
        _simhash_piece_rows_raw(documents)
        .withColumn("rn", F.row_number().over(wcap))
        .filter(F.col("rn") <= bucket_cap)
        .drop("rn"),
        # lazy hold (r13): see hold() — the self-join's first scan fills it
    )
    return (
        pieces.alias("l")
        .join(
            pieces.alias("r"),
            (F.col("l.piece") == F.col("r.piece"))
            & (F.col("l.pval") == F.col("r.pval"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.expr("bit_count(l.simhash64 ^ r.simhash64)").cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def dedup_clusters(
    documents: DataFrame,
    candidates: DataFrame | None = None,
    max_iters: int = 20,
    driver_cutoff: int = DRIVER_CC_MAX_EDGES,
) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the candidate-pair
    graph.

    Output: (doc_id, component_id) for every document appearing in at least
    one candidate pair, where component_id = min doc_id of its component.

    Adaptive strategy (AQE-style): the edge set is counted once (an action
    that also materializes the persisted frame the loop would reuse). If it
    fits the driver comfortably (<= driver_cutoff), components are solved
    with union-find locally and returned as a small local relation —
    O(E α(E)) with zero shuffles, the same call every serious graph system
    makes when a graph collapses below a threshold. Otherwise, distributed
    min-label propagation: each round combines a neighbor-min step with a
    pointer-jumping step (label := label of my label), so convergence is
    O(log diameter) rounds rather than O(diameter) — a chain of 1M near-dups
    converges in ~20 rounds. Non-convergence inside max_iters raises rather
    than silently returning partial components.
    """
    from pyspark.sql import functions as F

    if candidates is None:
        candidates = minhash_candidates(documents)
    # both orientations from ONE pass over the candidate pipeline (a union
    # of two selects would execute the unpersisted candidate subplan twice)
    edges = hold(
        candidates.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
                    ),
                    F.struct(
                        F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
    )
    if edges.count() <= driver_cutoff:
        from pyspark.sql.types import StructField, StructType

        id_type = edges.schema["src"].dataType
        # collect (not toLocalIterator): the cutoff already bounds the size,
        # and toLocalIterator schedules one sequential job per partition
        pairs = _union_find_components(
            (r.src, r.dst) for r in edges.collect()
        )
        edges.unpersist()
        schema = StructType(
            [
                StructField("doc_id", id_type, False),
                StructField("component_id", id_type, False),
            ]
        )
        return edges.sparkSession.createDataFrame(pairs, schema)
    labels = edges.select(F.col("src").alias("doc_id")).distinct().withColumn(
        "component_id", F.col("doc_id")
    ).persist()

    converged = False
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("component_id").alias("nbr_min"))
        )
        stepped = labels.join(neighbor_min, "doc_id", "left").select(
            "doc_id",
            F.least(
                F.col("component_id"), F.coalesce(F.col("nbr_min"), F.col("component_id"))
            ).alias("component_id"),
        )
        # pointer jumping: follow my label's label (labels are doc_ids, so
        # the self-join resolves one extra hop per round — halves the
        # remaining distance to the component minimum each iteration)
        parent = stepped.select(
            F.col("doc_id").alias("p_doc"), F.col("component_id").alias("p_lbl")
        )
        new_labels = (
            stepped.join(parent, stepped.component_id == parent.p_doc, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component_id"), F.coalesce(F.col("p_lbl"), F.col("component_id"))
                ).alias("component_id"),
            )
            .persist()
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("component_id", "old"), "doc_id")
            .filter(F.col("component_id") != F.col("old"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        labels.unpersist()
        raise RuntimeError(
            f"dedup_clusters: label propagation did not converge within "
            f"{max_iters} pointer-jumping rounds (graph diameter > 2^{max_iters})"
        )
    return register(labels)


def ngram_jaccard_pairs(
    documents: DataFrame,
    candidates: DataFrame | None = None,
    threshold: float = 0.0,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard similarity over distinct word-3-gram sets for candidate
    pairs (from minhash_candidates by default). Output:
    (doc_a, doc_b, inter_size, union_size, jaccard). ``shingles`` lets a
    caller that already materialized the DISTINCT (doc_id, s) relation
    share it."""
    # distinct shingle ROWS materialize FIRST: they feed the Jaccard joins
    # below AND (via shingles=) the MinHash signature pipeline, so the
    # posexplode + window shingle construction runs once, not twice
    ds = (
        shingles
        if shingles is not None
        else hold(_shingle_rows(documents).distinct())
    )
    if candidates is None:
        # tiny pair relation consumed by two joins below — persist so the
        # band self-join behind it runs once
        candidates = hold(minhash_candidates(documents, shingles=ds))
    # join formulation: intersection = equi-join count restricted to
    # candidate pairs — no per-row array_intersect over big arrays, and
    # every stage is a codegen hash agg/join
    sizes = ds.groupBy("doc_id").agg(F.count(F.lit(1)).cast("int").alias("n_sh"))
    inter = (
        candidates.join(
            ds.select(F.col("doc_id").alias("doc_a"), "s"), "doc_a"
        )
        .join(ds.select(F.col("doc_id").alias("doc_b"), "s"), ["doc_b", "s"], "left_semi")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("int").alias("inter_size"))
    )
    out = (
        candidates.join(inter, ["doc_a", "doc_b"], "left")
        .fillna(0, ["inter_size"])
        .join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "inter_size",
            (F.col("n_a") + F.col("n_b") - F.col("inter_size")).alias("union_size"),
            (
                F.col("inter_size")
                / (F.col("n_a") + F.col("n_b") - F.col("inter_size"))
            ).alias("jaccard"),
        )
    )
    if threshold > 0:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


# Fixed-size audit slice for minhash_precision_audit: the exact all-pairs
# ground truth is only computed inside this slice, so the audit's cost is
# CONSTANT at any corpus scale (150 docs -> ~11k pairs).
PRECISION_AUDIT_DOCS = 150


def minhash_precision_audit(
    documents: DataFrame, n_docs: int = PRECISION_AUDIT_DOCS
) -> DataFrame:
    """Truth-link audit for the MinHash LSH screen: on a FIXED-size doc
    slice (doc_id < n_docs) compute the exact all-pairs shingle-Jaccard
    ground truth (near-dup = jaccard >= 1/2, stated as the integer test
    2*inter >= union) and measure the band-candidate generator against
    it — precision (candidate pairs that are true near-dups) and recall
    (true near-dups surfaced as candidates), in integer ppm.

    This is the observability a 100 TB dedup deployment runs nightly:
    banding parameters (16 hashes x 4 bands) drift out of tune as the
    corpus shifts, and this query says so with exact arithmetic. The
    all-pairs stage never leaves the bounded slice, so cost is constant
    in corpus size; candidates are the REAL banding chain
    (minhash_candidates) run on the slice.

    Output (one row): (n_docs, n_truth, n_candidates, n_true_pos,
    precision_ppm, recall_ppm)."""
    sliced = documents.filter(F.col("doc_id") < int(n_docs))
    ds = hold(_shingle_rows(sliced).distinct())
    cand = minhash_candidates(sliced, shingles=ds)
    sizes = ds.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n_sh"))
    inter = (
        ds.select(F.col("doc_id").alias("doc_a"), "s")
        .join(ds.select(F.col("doc_id").alias("doc_b"), "s"), "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter_size"))
    )
    truth = (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")),
            "doc_b",
        )
        .filter(
            2 * F.col("inter_size") >= F.col("n_a") + F.col("n_b") - F.col("inter_size")
        )
        .select("doc_a", "doc_b")
    )
    both = cand.withColumn("in_cand", F.lit(1)).join(
        truth.withColumn("in_truth", F.lit(1)), ["doc_a", "doc_b"], "full"
    )
    stats = both.agg(
        F.coalesce(F.sum("in_truth"), F.lit(0)).cast("long").alias("n_truth"),
        F.coalesce(F.sum("in_cand"), F.lit(0)).cast("long").alias("n_candidates"),
        F.coalesce(F.sum(F.col("in_cand") * F.col("in_truth")), F.lit(0))
        .cast("long")
        .alias("n_true_pos"),
    )
    return stats.select(
        F.lit(int(n_docs)).cast("int").alias("n_docs"),
        "n_truth",
        "n_candidates",
        "n_true_pos",
        F.expr(
            "cast(case when n_candidates = 0 then 0"
            " else n_true_pos * 1000000 div n_candidates end as bigint)"
        ).alias("precision_ppm"),
        F.expr(
            "cast(case when n_truth = 0 then 0"
            " else n_true_pos * 1000000 div n_truth end as bigint)"
        ).alias("recall_ppm"),
    )


# The "daily batch" split for incremental ingest dedup: docs whose id
# lands in the slot are the INCOMING batch, everything else is the
# EXISTING corpus — deterministic and scale-invariant.
INCOMING_MOD = 10
INCOMING_SLOT = 7
INCOMING_DUP_THRESHOLD = 0.5


def dedup_incoming(
    documents: DataFrame,
    threshold: float = INCOMING_DUP_THRESHOLD,
    mod: int = INCOMING_MOD,
    slot: int = INCOMING_SLOT,
    bucket_cap: int = BAND_BUCKET_CAP,
) -> DataFrame:
    """Incremental ingest dedup: screen an INCOMING batch against the
    EXISTING corpus only — the pair join is incoming x existing (no
    incoming-incoming, no existing-existing), which is the nightly-ingest
    shape: at 100 TB the existing side's band index (minhash_band_rows) is
    a precomputed artifact and each run touches only the buckets the new
    batch hashes into, so cost scales with the BATCH, not the corpus.

    A batch doc is a duplicate when its exact shingle-set Jaccard to some
    existing candidate reaches ``threshold``; the reported match is the
    best one (highest Jaccard, smallest doc_id tiebreak).

    Output: one row per incoming doc —
    (doc_id, is_dup, match_doc, jaccard) with NULL match columns for
    fresh docs."""
    from pyspark.sql.window import Window

    ds = hold(_shingle_rows(documents).distinct())
    bands = minhash_band_rows(documents, bucket_cap=bucket_cap, shingles=ds)
    is_in = (F.col("doc_id") % mod) == slot
    bi = bands.filter(is_in).select(
        F.col("doc_id").alias("doc_a"), "band", "key"
    )
    be = bands.filter(~is_in).select(
        F.col("doc_id").alias("doc_b"), "band", "key"
    )
    pairs = bi.join(be, ["band", "key"]).select("doc_a", "doc_b").distinct()
    j = ngram_jaccard_pairs(
        documents, candidates=pairs, threshold=threshold, shingles=ds
    )
    w = Window.partitionBy("doc_a").orderBy(F.col("jaccard").desc(), "doc_b")
    best = (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("doc_a").alias("doc_id"),
            F.col("doc_b").alias("match_doc"),
            "jaccard",
        )
    )
    return (
        documents.filter(is_in)
        .select("doc_id")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.col("match_doc").isNotNull().alias("is_dup"),
            "match_doc",
            "jaccard",
        )
    )


def build_dedup_index(
    documents: DataFrame, out_dir: str, bucket_cap: int = BAND_BUCKET_CAP
) -> None:
    """Persist the near-dup screening index for a corpus as a parquet
    ARTIFACT: ``bands/`` (the capped (doc_id, band, key) LSH bucket
    relation) and ``shingles/`` (the distinct (doc_id, s) word-shingle
    relation the Jaccard verifier needs). At 100 TB this is the nightly
    build over the existing corpus; every subsequent ingest screen
    (dedup_incoming_indexed) reads the artifact instead of re-deriving
    signatures for data that never changed — cost scales with the batch,
    not the corpus. Committed through the manifest discipline
    (functions/_index_commit.py): both relations publish under ONE
    atomic ``_CURRENT`` flip with the build's bucket_cap recorded, so a
    crashed build leaves no readable index and appends validate their
    cap against the stored one (round-12 verdict #1)."""
    from ._cache import registry_mark, release_cached_from
    from ._index_commit import commit_index_build

    mark = registry_mark()
    try:
        ds = hold(_shingle_rows(documents).distinct())
        bands = minhash_band_rows(documents, bucket_cap=bucket_cap, shingles=ds)
        commit_index_build(
            out_dir,
            writes={"bands": bands, "shingles": ds},
            meta={"bucket_cap": bucket_cap},
            family=DEDUP_INDEX_FAMILY,
        )
    finally:
        release_cached_from(mark)


def update_dedup_index(
    new_documents: DataFrame, index_dir: str, bucket_cap: int = BAND_BUCKET_CAP
) -> None:
    """APPEND newly admitted documents to a persisted build_dedup_index
    artifact — the step that closes the ingest loop: screen a batch
    (dedup_incoming_indexed), keep the non-dups, update_dedup_index them
    so the NEXT batch screens against today's admissions without a full
    rebuild. Cost scales with the increment, never the corpus.

    Equivalence contract: per-document band/shingle rows are independent
    of corpus membership, so the appended artifact holds exactly the
    rows a from-scratch rebuild over (existing UNION new) would — except
    bucket caps, which apply WITHIN each build: a bucket that crosses
    the cap only across increments keeps cap rows per increment rather
    than cap total (strictly MORE candidates — recall never degrades vs
    the rebuild; dedup_cap_audit reports when any bucket is near the cap
    and a rebuild should re-tighten it). Caller contract: new doc_ids
    must be disjoint from the indexed corpus (screened batches are).

    Crash-atomic (round-12 verdict #1): both increments land in fresh
    manifest-unreferenced batch dirs and ONE atomic manifest flip
    commits them — a crash between the bands and shingles writes
    leaves the old index readable (a banded-but-unshingled doc would
    otherwise band-match without ever Jaccard-verifying). ``bucket_cap``
    must match the build's recorded cap: mixing caps across increments
    would silently change which buckets truncate."""
    from ._cache import registry_mark, release_cached_from
    from ._index_commit import commit_index_append, require_index_manifest

    man = require_index_manifest(index_dir, DEDUP_INDEX_FAMILY)
    built_cap = man.get("meta", {}).get("bucket_cap")
    if built_cap is not None and built_cap != bucket_cap:
        raise ValueError(
            f"dedup index was built with bucket_cap={built_cap} but the"
            f" append passed bucket_cap={bucket_cap}; increments must"
            " share the build's cap"
        )
    mark = registry_mark()
    try:
        ds = hold(_shingle_rows(new_documents).distinct())
        bands = minhash_band_rows(
            new_documents, bucket_cap=bucket_cap, shingles=ds
        )
        commit_index_append(
            index_dir,
            writes={"bands": bands, "shingles": ds},
            family=DEDUP_INDEX_FAMILY,
        )
    finally:
        release_cached_from(mark)


def dedup_incoming_indexed(
    incoming: DataFrame,
    index_dir: str,
    threshold: float = INCOMING_DUP_THRESHOLD,
    bucket_cap: int = BAND_BUCKET_CAP,
) -> DataFrame:
    """Screen an INCOMING batch against a PERSISTED index
    (build_dedup_index artifact) — the true nightly-ingest shape: only
    the batch's signatures are computed; the existing corpus contributes
    its pre-built band buckets and shingle sets from parquet.

    Cap semantics are PER SIDE (the artifact was capped over the existing
    corpus at build time; the batch caps over itself), unlike
    dedup_incoming's joint cap — identical results on any corpus where no
    bucket nears the cap (band_cap_audit reports exactly when that stops
    holding). Output matches dedup_incoming:
    (doc_id, is_dup, match_doc, jaccard). Scans manifest-committed batch
    dirs ONLY (a crashed append's orphans are refused)."""
    from pyspark.sql.window import Window

    from ._index_commit import relation_paths, require_index_manifest

    spark = incoming.sparkSession
    man = require_index_manifest(index_dir, DEDUP_INDEX_FAMILY)
    bands_e = spark.read.parquet(*relation_paths(index_dir, man, "bands"))
    sh_e = spark.read.parquet(*relation_paths(index_dir, man, "shingles"))
    ds_i = hold(_shingle_rows(incoming).distinct())
    bands_i = minhash_band_rows(incoming, bucket_cap=bucket_cap, shingles=ds_i)
    pairs = hold(
        bands_i.select(F.col("doc_id").alias("doc_a"), "band", "key")
        .join(
            bands_e.select(F.col("doc_id").alias("doc_b"), "band", "key"),
            ["band", "key"],
        )
        .select("doc_a", "doc_b")
        .distinct(),
    )
    # doc_ids are disjoint across sides, so the union is a valid single
    # shingle relation for the shared Jaccard verifier
    ds = ds_i.unionByName(sh_e)
    j = ngram_jaccard_pairs(
        incoming, candidates=pairs, threshold=threshold, shingles=ds
    )
    w = Window.partitionBy("doc_a").orderBy(F.col("jaccard").desc(), "doc_b")
    best = (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("doc_a").alias("doc_id"),
            F.col("doc_b").alias("match_doc"),
            "jaccard",
        )
    )
    return (
        incoming.select("doc_id")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.col("match_doc").isNotNull().alias("is_dup"),
            "match_doc",
            "jaccard",
        )
    )


DUP_SPAN_K = 20  # duplicated-passage gram width (tokens)


def dup_spans(documents: DataFrame, k: int = DUP_SPAN_K) -> DataFrame:
    """Exact duplicated-passage spans: maximal token ranges covered by
    k-token grams that occur >= 2 times ANYWHERE in the corpus (across
    documents or repeated within one) — the ExactSubstr-style pass of
    Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
    Better"), at token granularity: a passage repeated verbatim yields
    every one of its k-gram offsets as a duplicate hit, and merging the
    overlapping [pos, pos+k) hit windows recovers the full passage span.

    Scale shape (100 TB): the gram relation is one map-only pass
    (transform + posexplode, all codegen; rows = token count, payload =
    (doc_id, pos, 128-bit md5) — no raw text moves); duplicate grams are
    ONE hash agg on the hash; the join back touches hit positions only;
    the span merge is a per-doc window over HITS (typically a tiny
    fraction of grams) — the lag + running-break-sum interval merge, the
    same one-shuffle pattern as scd2_intervals. No all-pairs anywhere,
    unlike suffix-array approaches this needs no global order.

    Output: (doc_id, span_start, span_end) half-open token ranges;
    overlapping AND adjacent hit windows merge (pos <= prev_pos + k).
    """
    # width-pinned on the gram hash (the graph family's discipline): one
    # explicit core-count-wide shuffle that the duplicate-gram agg AND the
    # hit join both reuse (hash-partitioned on g satisfies their
    # clustering), instead of two shuffle.partitions-wide shuffles of the
    # corpus-sized gram relation — the sort-shuffle writer's
    # reducers x tasks buffer matrix is what OOMed a bare 1 GiB session
    # under compare.py's collect pressure (LOCALGATE_r10 note)
    width = documents.sparkSession.sparkContext.defaultParallelism
    grams = hold(_gram_rows(documents, k).repartition(width, "g"))
    # the agg re-pins width explicitly: under AQE the cached plan's
    # partitioning is opaque (InMemoryRelation wraps an AdaptiveSparkPlan,
    # so ENSURE_REQUIREMENTS would insert a shuffle.partitions-wide
    # exchange of the corpus-sized gram relation); the explicit
    # REPARTITION_BY_NUM on the projected hash column is the bounded
    # shuffle the agg then reuses shuffle-free
    dup_g = (
        grams.select("g")
        .repartition(width, "g")
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("g")
    )
    hits = grams.join(dup_g, "g").select("doc_id", "pos")
    return _merge_hit_spans(hits, k)


def _gram_rows(documents: DataFrame, k: int) -> DataFrame:
    """(doc_id, pos, g) k-token gram md5 rows at every position — one
    map-only codegen pass (transform + posexplode); docs under k tokens
    emit nothing."""
    n_parts = documents.sparkSession.sparkContext.defaultParallelism
    d = documents.repartition(n_parts, "doc_id").select(
        "doc_id", tokens_col().alias("toks")
    )
    return d.filter(F.size("toks") >= k).select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, size(toks) - {k - 1}),"
                f" i -> md5(concat_ws(' ', slice(toks, i, {k}))))"
            )
        ).alias("pos", "g"),
    )


def _merge_hit_spans(hits: DataFrame, k: int) -> DataFrame:
    """Merge duplicate-gram hit windows [pos, pos+k) per doc into maximal
    spans — the lag + running-break-sum interval pattern."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    spans = (
        hits.withColumn("prev", F.lag("pos").over(w))
        .withColumn(
            "brk",
            F.when(
                F.col("prev").isNull() | (F.col("pos") > F.col("prev") + k),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "span_id",
            F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("doc_id", "span_id")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k).alias("span_end"),
        )
        .select("doc_id", "span_start", "span_end")
    )
    return spans


def dup_span_stats(documents: DataFrame, k: int = DUP_SPAN_K) -> DataFrame:
    """Per-document duplicated-passage report over dup_spans(): how many
    merged duplicate spans a document carries and what fraction of its
    tokens sit inside one — the signal exact-substring dedup acts on
    (mask/remove the spans, keep the document). Integer-exact ppm.

    Output: (doc_id, n_tokens, n_spans, dup_tokens, dup_ppm), one row per
    document (zeros when nothing repeats; docs shorter than k tokens
    carry no grams by construction)."""
    spans = dup_spans(documents, k=k)
    agg = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("span_end") - F.col("span_start")).alias("dup_tokens"),
    )
    return (
        documents.select("doc_id", F.size(tokens_col()).alias("n_tokens"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.coalesce(F.col("n_spans"), F.lit(0)).cast("int").alias("n_spans"),
            F.coalesce(F.col("dup_tokens"), F.lit(0))
            .cast("bigint")
            .alias("dup_tokens"),
            F.expr(
                "CAST(coalesce(dup_tokens, 0) * 1000000 div n_tokens AS BIGINT)"
            ).alias("dup_ppm"),
        )
    )


def remove_dup_spans(documents: DataFrame, k: int = DUP_SPAN_K) -> DataFrame:
    """The ACTION half of exact-substring dedup: rebuild each document's
    text with every duplicated span (dup_spans) cut out — keep the
    document, drop the boilerplate, the remedy Lee et al. apply after
    detection (vs whole-doc dedup which would throw the originals away).

    Scale shape: tokens posexplode once; spans arrive as a per-doc join
    (few spans per doc — multiplicity is spans-per-doc, never corpus-
    sized); surviving tokens re-assemble with one per-doc hash agg
    (array_sort over (pos, token) structs -> concat), so the only
    shuffles are the span build and the per-doc reassembly, both keyed
    on doc_id.

    Output: (doc_id, n_tokens, n_tokens_kept, clean_text) for every
    document; clean_text is '' when the whole text was duplicated."""
    spans = dup_spans(documents, k=k)
    n_parts = documents.sparkSession.sparkContext.defaultParallelism
    tok = (
        documents.repartition(n_parts, "doc_id")
        .select("doc_id", F.posexplode(tokens_col()).alias("pos", "t"))
    )
    kept = (
        tok.join(
            spans,
            (tok["doc_id"] == spans["doc_id"])
            & (tok["pos"] >= spans["span_start"])
            & (tok["pos"] < spans["span_end"]),
            "left_anti",
        )
    )
    rebuilt = (
        kept.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "t"))).alias("ts"))
        .select(
            "doc_id",
            F.size("ts").cast("int").alias("n_tokens_kept"),
            F.array_join(F.expr("transform(ts, x -> x.t)"), " ").alias(
                "clean_text"
            ),
        )
    )
    return (
        documents.select("doc_id", F.size(tokens_col()).cast("int").alias("n_tokens"))
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_tokens_kept", F.lit(0)).alias("n_tokens_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def build_span_index(
    documents: DataFrame, out_dir: str, k: int = DUP_SPAN_K
) -> None:
    """Persist the exact-substring screening index for a corpus: the
    DISTINCT k-gram hash set as parquet (``grams/``). Membership is all
    an ingest screen needs — one existing occurrence plus one incoming
    occurrence already makes a duplicate — so counts never ship. The
    nightly-build twin of build_dedup_index for the passage-level pass;
    index size is the corpus's distinct-gram count, not its token count."""
    import os

    _gram_rows(documents, k).select("g").distinct().write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "grams"))


def dup_span_stats_incoming(
    incoming: DataFrame, index_dir: str, k: int = DUP_SPAN_K
) -> DataFrame:
    """Screen an INCOMING batch for duplicated passages against a
    PERSISTED gram index (build_span_index artifact): a batch position is
    a hit when its gram appears in the existing corpus (index membership
    — one occurrence there + this one = duplicate) OR >= 2 times within
    the batch itself. Only the batch's grams are computed — screen cost
    scales with the batch, not the corpus — and the index side joins as
    a (gram-hash) semi join.

    Output matches dup_span_stats: (doc_id, n_tokens, n_spans,
    dup_tokens, dup_ppm), one row per incoming document."""
    import os

    spark = incoming.sparkSession
    idx = spark.read.parquet(os.path.join(index_dir, "grams"))
    grams = hold(_gram_rows(incoming, k))
    batch_dup = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("g")
    )
    dup_g = batch_dup.unionByName(idx.select("g")).distinct()
    hits = grams.join(dup_g, "g").select("doc_id", "pos")
    spans = _merge_hit_spans(hits, k)
    agg = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("span_end") - F.col("span_start")).alias("dup_tokens"),
    )
    return (
        incoming.select("doc_id", F.size(tokens_col()).alias("n_tokens"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.coalesce(F.col("n_spans"), F.lit(0)).cast("int").alias("n_spans"),
            F.coalesce(F.col("dup_tokens"), F.lit(0))
            .cast("bigint")
            .alias("dup_tokens"),
            F.expr(
                "CAST(coalesce(dup_tokens, 0) * 1000000 div n_tokens AS BIGINT)"
            ).alias("dup_ppm"),
        )
    )


def token_set_near_dup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Set-similarity self-join by DELETION-NEIGHBORHOOD banding (the
    SymSpell idea applied to token sets): two rows match when their
    sorted-distinct token sets differ by at most one token — i.e.
    |A intersect B| >= max(|A|, |B|) - 1. Each row emits its full token
    set plus every delete-one subset as band keys; any qualifying pair
    provably shares at least one key (the common (max-1)-subset, or the
    smaller set itself when A is contained in B), so banding finds
    EXACTLY the qualifying pairs — no false negatives, and by the same
    subset argument every candidate already satisfies the predicate; the
    overlap is recomputed on the pair output as an audit column, not a
    filter.

    Scale shape: n+1 keys per row (n = token count, bounded by the name
    length), one distinct + self-join on the key — no all-pairs stage;
    a key shared by m rows yields C(m,2) candidate rows before the pair
    distinct, the same observability contract as the LSH bands (screen
    degenerate key spaces with the cap-audit pattern before running at
    scale). Keys join as space-joined strings — tokens are space-split so
    the separator cannot occur inside a token and the encoding is
    injective. Output: (id_1, id_2, n_tokens_1, n_tokens_2, overlap) with
    id_1 < id_2, one row per pair."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.array_sort(F.array_distinct(F.split(F.col(text_col), " "))).alias(
            "toks"
        ),
    )
    keys = (
        toks.select(
            "_id",
            F.explode(
                F.expr(
                    "array_union(array(toks),"
                    " transform(sequence(1, size(toks)),"
                    " i -> concat(slice(toks, 1, i - 1),"
                    "             slice(toks, i + 1, size(toks) - i))))"
                )
            ).alias("key_arr"),
        )
        .select("_id", F.concat_ws(" ", "key_arr").alias("k"))
        .distinct()
    )
    pairs = (
        keys.alias("a")
        .join(keys.alias("b"), "k")
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_1"), F.col("b._id").alias("id_2"))
        .distinct()
    )
    t1 = toks.select(F.col("_id").alias("id_1"), F.col("toks").alias("toks_1"))
    t2 = toks.select(F.col("_id").alias("id_2"), F.col("toks").alias("toks_2"))
    return (
        pairs.join(t1, "id_1")
        .join(t2, "id_2")
        .select(
            "id_1",
            "id_2",
            F.size("toks_1").cast("int").alias("n_tokens_1"),
            F.size("toks_2").cast("int").alias("n_tokens_2"),
            F.size(F.array_intersect("toks_1", "toks_2"))
            .cast("int")
            .alias("overlap"),
        )
    )


def compact_dedup_index(spark, index_dir: str) -> int:
    """Fold an append-heavy dedup artifact's per-batch bands/shingles
    dirs into one batch each (plain concatenation — band and shingle
    rows are per-document facts; the per-increment cap semantics are a
    property of how rows were GENERATED, which compaction preserves
    verbatim). Atomic (functions/_index_commit.py::compact_index)."""
    from ._index_commit import compact_index

    return compact_index(spark, index_dir, DEDUP_INDEX_FAMILY)
