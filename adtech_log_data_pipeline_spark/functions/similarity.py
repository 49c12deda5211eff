"""Similarity search over the `embeddings` table (vec_id, embedding
array<float>, label) — brute-force cosine top-k as the exact baseline,
random-hyperplane LSH and IVF inverted lists as the scale paths
(BASELINE.json north star).

Scale design: brute force is O(queries x corpus) — correct but only
viable when the query set is small or the corpus is pre-filtered; it
broadcasts the query vectors so the corpus never shuffles. The LSH
variant hashes every vector to a signature bucket map-side (one
Arrow-batched matmul, no shuffle, no per-dim row blow-up); the join then
touches only same-bucket pairs. The IVF variant does the same with
sampled centroids instead of random hyperplanes. Shared subplans
(signatures, assignments) are persisted through functions/_cache.py so
they compute once per query, and vector norms are projected per SIDE
before any join so the per-pair work is a single dot product.

Determinism: every dot product that feeds a sign test or a ranking is
rounded to 1e-6 first, so a float-summation-order difference between
Spark and the DuckDB oracle can never flip a bucket bit or a rank.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LSH_BITS_MIN = 6  # floor; lsh_bits() scales with the corpus (bucket ~ 64 vecs)
LSH_TARGET_BUCKET = 64
# Degenerate-bucket guardrail for the near-dup candidate join: an
# all-identical corpus would otherwise make one bucket O(n^2). Membership
# beyond the cap (deterministic keep-rule: smallest vec_ids) is dropped
# from PAIR GENERATION only; at the default no real bucket reaches it.
NEAR_DUP_BUCKET_CAP = 1000
KMEANS_K = 8
KMEANS_ITERS = 3

_DOT = "aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v)"


def _norm(col: str) -> F.Column:
    return F.expr(
        f"sqrt(aggregate({col}, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double)))"
    )


def _cosine_r6() -> F.Column:
    """round(dot(a, b) / (na * nb), 6) with the norms ALREADY projected on
    each side (columns na/nb) — the per-pair lambda work is one dot, not
    three array folds (the norms would otherwise be recomputed once per
    PAIR instead of once per vector).

    A zero-norm vector has no defined cosine: the denominator is
    NULL-guarded so the result is NULL (DuckDB's own x/0 answer —
    engine parity holds even on degenerate corpora) instead of an ANSI
    DIVIDE_BY_ZERO error; threshold filters then drop the pair and
    DESC rankings sort it last on both engines."""
    return F.round(F.expr(_DOT) / F.expr("nullif(na * nb, 0D)"), 6)


def lsh_bits(n: int) -> int:
    """Hyperplane count scaled to the corpus: enough bits that the mean
    bucket holds ~LSH_TARGET_BUCKET vectors, floored at LSH_BITS_MIN. The
    DuckDB oracle states the identical formula (greatest/ceil/log2), so
    both sides derive the same bucket space at any scale."""
    if n <= LSH_TARGET_BUCKET:
        return LSH_BITS_MIN
    return max(LSH_BITS_MIN, math.ceil(math.log2(n / float(LSH_TARGET_BUCKET))))


_PLANES: dict[tuple[int, int], np.ndarray] = {}


def _planes(bits: int, dim: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes: w[d, i] derived from
    md5(f"{i}:{d}") mapped into [-1, 1] — restatable verbatim in DuckDB.
    Built once per Python worker process (module cache)."""
    key = (bits, dim)
    if key not in _PLANES:
        import hashlib

        w = np.empty((dim, bits), dtype=np.float64)
        for i in range(bits):
            for d in range(dim):
                w[d, i] = (
                    int(hashlib.md5(f"{i}:{d}".encode()).hexdigest()[:8], 16)
                    / 2147483647.5
                    - 1.0
                )
        _PLANES[key] = w
    return _PLANES[key]


def lsh_signatures(embeddings: DataFrame, bits: int = LSH_BITS_MIN) -> DataFrame:
    """Random-hyperplane (sign) LSH: bit i = sign(round(dot(v, h_i), 6)).

    Map-side only: one Arrow-batched float64 matmul per batch against the
    broadcast-by-closure (bits x dim) weight matrix — no posexplode, no
    (vec, dim) shuffle, no driver action to learn the dimension (the batch
    itself carries it). The sign test rounds the dot to 1e-6 so a
    summation-order difference vs the sequential DuckDB oracle can never
    flip a bucket bit."""

    @F.pandas_udf("int")
    def bucket(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype="int32")
        x = np.stack(emb.to_numpy()).astype(np.float64)
        w = _planes(bits, x.shape[1])
        dots = np.round(x @ w, 6)
        sig = ((dots >= 0).astype(np.int64) << np.arange(bits, dtype=np.int64)).sum(
            axis=1
        )
        return pd.Series(sig.astype(np.int32))

    return embeddings.select("vec_id", bucket(F.col("embedding")).alias("bucket"))


def brute_force_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    `queries` is (query_id, qvec); the full corpus is scanned once per
    partition with the queries broadcast. Norms are projected per side
    before the join (once per vector, not per pair); ranking uses the
    cosine rounded to 1e-6 with doc-id tiebreak so results are stable
    under any float summation schedule. Output:
    (query_id, neighbor_id, rank, cos_sim_r6)."""
    from pyspark.sql.window import Window

    q = queries.select(
        F.col("query_id"),
        F.col("qvec").alias("a"),
        _norm("qvec").alias("na"),
    )
    c = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("b"),
        _norm("embedding").alias("nb"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", _cosine_r6().alias("cos_sim_r6"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim_r6").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim_r6")
    )


def hard_negative_topk(
    embeddings: DataFrame, anchors: DataFrame, k: int = 5
) -> DataFrame:
    """Contrastive hard-negative mining: for each labeled anchor vector,
    the exact cosine top-k corpus neighbors whose ``label`` DIFFERS from
    the anchor's — the near-misses a contrastive trainer wants as
    negatives (training-data prep for embedding models).

    ``anchors`` is (query_id, qvec, qlabel); the corpus is the full
    (vec_id, embedding, label) table. Same scale shape and determinism
    conventions as brute_force_topk (anchors broadcast, norms projected
    per side, 1e-6-rounded cosine with id tiebreak); at corpus scale the
    coarse stage composes with ivf_topk/lsh_topk exactly like the
    positive-neighbor path. Output:
    (query_id, anchor_label, neighbor_id, neighbor_label, rank,
    cos_sim_r6)."""
    from pyspark.sql.window import Window

    q = anchors.select(
        "query_id",
        F.col("qvec").alias("a"),
        _norm("qvec").alias("na"),
        F.col("qlabel").alias("anchor_label"),
    )
    c = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("b"),
        _norm("embedding").alias("nb"),
        F.col("label").alias("neighbor_label"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_label") != F.col("anchor_label"))
        .select(
            "query_id",
            "anchor_label",
            "neighbor_id",
            "neighbor_label",
            _cosine_r6().alias("cos_sim_r6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim_r6").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "anchor_label",
            "neighbor_id",
            "neighbor_label",
            "rank",
            "cos_sim_r6",
        )
    )


def kmeans_seed_vectors(
    embeddings: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    total: int | None = None,
) -> DataFrame:
    """Reassemble kmeans_centroids output into the (list_id, a, na) seed
    shape ivf_assignments consumes — the trained-centroid upgrade over the
    strided sample. The reassembly is one tiny (k-row) JVM aggregation
    (sorted collect over dims), never a driver collect."""
    cent = kmeans_centroids(embeddings, k=k, iters=iters, total=total)
    vecs = (
        cent.groupBy("cid")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim, centroid_micro))),"
                " s -> cast(s.centroid_micro as double) / 1000000)"
            ).alias("a")
        )
        .select(F.col("cid").alias("list_id"), "a", _norm("a").alias("na"))
    )
    return vecs


def ivf_assignments(
    embeddings: DataFrame,
    n_lists: int | None = None,
    total: int | None = None,
    seeds: DataFrame | None = None,
    seed_matrix=None,
) -> DataFrame:
    """IVF coarse quantizer: assign every vector to its nearest seed
    centroid. Seeds are a deterministic corpus sample (vec_id % stride == 0
    for ~n_lists seeds) — the stand-in for k-means centroids, keeping the
    whole index oracle-reproducible. Centroids broadcast with precomputed
    norms; assignment is a map-side argmax, (vec_id, list_id). Pass
    ``total`` when the caller already knows the corpus size to skip the
    count scan.

    ``n_lists`` defaults to ``max(10, isqrt(total))`` — the classic IVF
    balance point where per-list scan cost (~total/n_lists) matches the
    centroid-probe cost (~n_lists), so the index keeps scaling instead of
    degenerating to 10 giant lists on a 1e9-vector corpus.

    ``seeds`` overrides the strided sample with an external centroid
    relation (list_id, a array<double>, na) — e.g. kmeans_seed_vectors for
    trained centroids (better-balanced lists, higher recall at the same
    probe budget); ``seed_matrix`` additionally supplies the
    pre-collected numpy triple (PQIndex.seed_matrix) so a warm artifact
    path skips the per-invocation driver collect."""
    if seeds is None:
        if total is None:
            total = embeddings.count()
        if n_lists is None:
            n_lists = default_n_lists(total)
        stride = max(1, total // n_lists)
        seeds = embeddings.filter(F.col("vec_id") % stride == 0).select(
            F.col("vec_id").alias("list_id"),
            F.col("embedding").alias("a"),
        )
    return embeddings.select(
        "vec_id",
        nearest_list_udf(seeds, matrix=seed_matrix)(
            F.col("embedding")
        ).alias("list_id"),
    )


def _collect_seed_matrix(seeds: DataFrame):
    """Collect the broadcast-sized IVF seed relation (list_id, a) once
    into the (list_ids, matrix, norms) numpy triple every coarse
    quantizer consumer closes over. Seeds are ~isqrt(n) rows (bounded
    by construction), so the collect is safe at any corpus scale — but
    it is still a driver round-trip, so a loaded PQIndex memoizes the
    triple on the handle (PQIndex.seed_matrix — round-12 verdict #6)
    instead of re-collecting per invocation."""
    seed_rows = sorted(
        seeds.select("list_id", "a").collect(), key=lambda r: r[0]
    )
    list_ids = np.asarray([r[0] for r in seed_rows], dtype=np.int64)
    smat = np.asarray([r[1] for r in seed_rows], dtype=np.float64)
    snorm = np.sqrt((smat * smat).sum(axis=1))
    return list_ids, smat, snorm


def nearest_list_udf(seeds: DataFrame, matrix=None):
    """The IVF flat-quantizer assignment as a reusable Arrow-batched
    projection — built once per plan from the broadcast-sized seed
    relation (list_id, a), applicable to BATCH and STREAMING frames
    alike (it is a pure map-side select, so a streaming consumer stays
    stateless — streaming/pq_screen.py).

    The flat quantizer IS the assignment cost (n_vecs x n_lists
    cosines). A crossJoin + higher-order-function cosine pays an
    interpreted lambda per element; one Arrow-batched float64 matmul
    per batch against the closure-broadcast (n_lists x dim) centroid
    matrix is the lsh_signatures pattern and ~10x cheaper. Centroids
    are k rows (k ~ isqrt(n): 16 MB of float64 at n=1e9, dim=64) —
    the standard broadcast size for an IVF coarse quantizer. Rounding
    to 1e-6 before the argmax keeps a summation-order ulp vs the
    sequential DuckDB oracle from ever flipping an assignment; ties
    break to the smallest list_id (seed rows sorted by list_id, and
    np.argmax returns the FIRST max).

    ``matrix`` supplies a pre-collected _collect_seed_matrix triple
    (PQIndex.seed_matrix) so a warm artifact path pays no driver
    round-trip per invocation."""
    list_ids, smat, snorm = (
        matrix if matrix is not None else _collect_seed_matrix(seeds)
    )

    @F.pandas_udf("long")
    def nearest_list(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype="int64")
        x = np.stack(emb.to_numpy()).astype(np.float64)
        xnorm = np.sqrt((x * x).sum(axis=1))
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = np.round((x @ smat.T) / np.outer(xnorm, snorm), 6)
        # zero-norm vectors: cosine is NULL in both engines; DuckDB's
        # DESC sort puts NULLs last, so the pick falls to the smallest
        # list_id — -inf under argmax reproduces that
        sims = np.nan_to_num(sims, nan=-np.inf)
        return pd.Series(list_ids[np.argmax(sims, axis=1)])

    return nearest_list


def default_n_lists(total: int) -> int:
    """Scaled IVF list count: max(10, isqrt(total)). Mirrored verbatim by
    the DuckDB oracle (plans/northstar.py::_ORACLE_IVF) as
    greatest(10, floor(sqrt(n + 0.5))) — the +0.5 makes the double sqrt
    floor agree with integer isqrt for every n below 2^50."""
    import math

    return max(10, math.isqrt(total))


def default_kmeans_k(total: int) -> int:
    """Scaled cluster count for semantic_dedup: max(KMEANS_K,
    isqrt(total) // 4) — k grows with the corpus so mean cluster size
    grows only as ~4*sqrt(n) and the capped cluster-local pair join keeps
    covering a constant FRACTION of each cluster instead of collapsing to
    8 fixed clusters (at 1e9 vectors a fixed k=8 with cap 1000 would
    compare ~8k vectors total). Mirrored by the DuckDB oracle as
    greatest(KMEANS_K, CAST(floor(sqrt(n + 0.5)) AS BIGINT) // 4)."""
    import math

    return max(KMEANS_K, math.isqrt(total) // 4)


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int | None = None,
    total: int | None = None,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """IVF search: rank candidates only within the query's inverted list
    (n_probes=1). Same output shape as brute_force_topk; at scale the
    inverted lists bound the scan to corpus/n_lists per query — the
    centroid-table sibling of the LSH path. The assignment relation feeds
    both the corpus and the query joins, so it is persisted and
    materialized ONCE (functions/_cache.py) — unpersisted, the whole
    count + crossJoin + window-argmax subplan would run per consumer."""
    from pyspark.sql.window import Window

    from ._cache import hold

    assign = hold(
        ivf_assignments(embeddings, n_lists, total=total, seeds=seeds),
    )
    corpus = embeddings.join(assign, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("b"),
        _norm("embedding").alias("nb"),
        "list_id",
    )
    q = queries.join(assign, queries.query_id == assign.vec_id).select(
        "query_id",
        F.col("qvec").alias("a"),
        _norm("qvec").alias("na"),
        "list_id",
    )
    scored = (
        corpus.join(F.broadcast(q), "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", _cosine_r6().alias("cos_sim_r6"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim_r6").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim_r6")
    )


def embedding_bucket_audit(
    embeddings: DataFrame,
    bucket_cap: int = NEAR_DUP_BUCKET_CAP,
    total: int | None = None,
) -> DataFrame:
    """Cap-pressure audit for embedding_near_dup_pairs' LSH bucket cap —
    the "no silent caps" rule for the EMBEDDING side (functions/dedup.py::
    band_cap_audit covers the text side): one row of bucket-population
    stats — (n_buckets, n_capped_buckets, n_members, n_dropped,
    max_bucket). Non-zero n_dropped = a degenerate embedding corpus is
    silently losing near-dup recall; raise the cap or the bit width.
    Scale shape: map-side signatures + one bucket hash agg — no pair
    generation."""
    n = embeddings.count() if total is None else total
    sigs = lsh_signatures(embeddings, bits=lsh_bits(n))
    cap = F.lit(bucket_cap)
    per = sigs.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    return per.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.when(F.col("n") > cap, 1).otherwise(0)).alias(
            "n_capped_buckets"
        ),
        F.sum("n").alias("n_members"),
        F.sum(F.greatest(F.col("n") - cap, F.lit(0))).alias("n_dropped"),
        F.max("n").cast("int").alias("max_bucket"),
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.8,
    bucket_cap: int = NEAR_DUP_BUCKET_CAP,
    total: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidate pairs share an LSH
    bucket (sub-quadratic; the full cross product never materializes), then
    the exact cosine filters at `threshold`. Bucket membership is capped at
    `bucket_cap` (keep-rule: smallest vec_ids) so a degenerate corpus —
    every vector identical — stays bucket-local O(cap^2) instead of O(n^2);
    the oracle states the same cap. Output: (vec_a, vec_b, cos_sim_r6)
    with vec_a < vec_b."""
    from pyspark.sql.window import Window

    from ._cache import hold

    n = embeddings.count() if total is None else total
    sigs = hold(lsh_signatures(embeddings, bits=lsh_bits(n)))
    wcap = Window.partitionBy("bucket").orderBy("vec_id")
    tagged = (
        embeddings.join(sigs, "vec_id")
        .select("vec_id", F.col("embedding").alias("v"), _norm("embedding").alias("nv"), "bucket")
        .withColumn("rn", F.row_number().over(wcap))
        .filter(F.col("rn") <= bucket_cap)
        .drop("rn")
    )
    left = tagged.select(
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("a"),
        F.col("nv").alias("na"),
        "bucket",
    )
    right = tagged.select(
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("b"),
        F.col("nv").alias("nb"),
        "bucket",
    )
    return (
        left.join(right, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", _cosine_r6().alias("cos_sim_r6"))
        .filter(F.col("cos_sim_r6") >= threshold)
    )


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    total: int | None = None,
) -> DataFrame:
    """Approximate top-k with MULTI-PROBE: each query ranks candidates in
    its own bucket plus every bucket at Hamming distance 1 (the standard
    sign-LSH recall fix — a near neighbor that disagrees on exactly one
    hyperplane is still found). Probe count is 1 + bits, so the scan
    fraction stays (1 + bits) / 2^bits — shrinking as the corpus (and
    bits) grow. Probing explodes the QUERY side only (queries are the
    small side, broadcast); corpus vectors still carry exactly one bucket.
    Same output shape as brute_force_topk; recall < 1 by construction.
    The signature relation feeds both the corpus and the query joins —
    persisted once via functions/_cache.py. Pass ``total`` (known corpus
    size, e.g. from parquet footer metadata) to skip the count job."""
    from pyspark.sql.window import Window

    from ._cache import hold

    n = embeddings.count() if total is None else total
    bits = lsh_bits(n)
    sigs = hold(lsh_signatures(embeddings, bits=bits))
    corpus = embeddings.join(sigs, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("b"),
        _norm("embedding").alias("nb"),
        "bucket",
    )
    q = (
        queries.join(sigs, queries.query_id == sigs.vec_id)
        .select(
            "query_id",
            F.col("qvec").alias("a"),
            _norm("qvec").alias("na"),
            "bucket",
        )
        .select(
            "query_id",
            "a",
            "na",
            F.explode(
                F.expr(
                    "concat(array(bucket),"
                    f" transform(sequence(0, {bits - 1}),"
                    " i -> cast(bucket ^ shiftleft(1, i) as int)))"
                )
            ).alias("bucket"),
        )
    )
    scored = (
        corpus.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", _cosine_r6().alias("cos_sim_r6"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim_r6").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim_r6")
    )


def kmeans_centroids(
    embeddings: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    total: int | None = None,
    micro_rows: DataFrame | None = None,
) -> DataFrame:
    """Distributed Lloyd's k-means over the embedding column, EXACT in
    integer micros — the real clustering pass behind an IVF index (the
    strided seeds ivf_assignments uses are exactly this algorithm's
    initialization, i.e. iters=0).

    Determinism across engines and shuffle orders: elements quantize to
    integer micros first; assignment distances are exact bigint squared
    sums (64-dim micro deltas peak ~2.6e14 — inside bigint); ties break to
    the smallest centroid id via lexicographic min(struct); centroid
    updates are one exactly-rounded double divide of an exact integer sum
    (the label_centroids convention). The DuckDB oracle restates all
    ``iters`` iterations as chained CTEs and matches bit-for-bit.

    Scale shape per iteration: centroids are (k x dims) int64 —
    closure-broadcast, NOT a join relation; assignment is a map-side
    Arrow matmul (_assign_to_centroids — exact int64 d2, no join, no
    shuffle); the update is assignment joined to the shared micro-row
    relation on vec_id and one (cid, dim) hash agg, whose k*dims result
    is collected driver-side (the centroids live on the driver between
    iterations — they are the broadcast payload either way). One shuffle
    per iteration total. Empty clusters keep their previous centroid
    with n_vecs = 0 (mirrored in the oracle via LEFT JOIN + COALESCE).
    Output: (cid, dim, n_vecs, centroid_micro) after ``iters`` updates."""
    from ._cache import hold

    # ``micro_rows`` lets a caller that already materialized the exploded
    # (vec_id, dim, x_micro) relation share it (semantic_dedup reuses it
    # for its quality screens); the update aggregation consumes it
    x = micro_rows if micro_rows is not None else hold(
        micro_vec_rows(embeddings)
    )
    if total is None:
        total = embeddings.count()
    stride = max(1, total // k)
    seed_rows = (
        x.filter(F.col("vec_id") % stride == 0)
        .select(F.col("vec_id").alias("cid"), "dim", F.col("x_micro"))
        .collect()
    )
    by_cid: dict[int, dict[int, int]] = {}
    for r in seed_rows:
        by_cid.setdefault(r[0], {})[r[1]] = r[2]
    if not by_cid:
        # empty input (or total=0): no seeds exist — return an empty
        # centroid relation instead of crashing on cids[0]
        return embeddings.sparkSession.createDataFrame(
            [], "cid long, dim int, n_vecs bigint, centroid_micro bigint"
        )
    cids = np.array(sorted(by_cid), dtype=np.int64)
    cmat = np.array(
        [[by_cid[c][d] for d in sorted(by_cid[c])] for c in cids],
        dtype=np.int64,
    )
    n_vecs = np.zeros(len(cids), dtype=np.int64)
    dim_index = {d: j for j, d in enumerate(sorted(by_cid[cids[0]]))}
    for _ in range(iters):
        assign = _assign_to_centroids(embeddings, cids, cmat)
        upd = (
            assign.join(x, "vec_id")
            .groupBy("cid", "dim")
            .agg(
                F.sum("x_micro").alias("sum_micro"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        # centroid update on the driver: k*dims values — the same data
        # that broadcasts next iteration. floor(double(sum)/n + 0.5) is
        # the oracle's exact quantization, one IEEE divide per cell.
        n_vecs = np.zeros(len(cids), dtype=np.int64)
        new_cmat = cmat.copy()  # empty clusters keep previous centroid
        cid_index = {int(c): i for i, c in enumerate(cids)}
        for r in upd:
            i, j = cid_index[r["cid"]], dim_index[r["dim"]]
            n_vecs[i] = r["n"]
            new_cmat[i, j] = int(
                np.floor(float(r["sum_micro"]) / r["n"] + 0.5)
            )
        cmat = new_cmat
    out = [
        (int(c), int(d), int(n_vecs[i]), int(cmat[i, j]))
        for i, c in enumerate(cids)
        for d, j in dim_index.items()
    ]
    return embeddings.sparkSession.createDataFrame(
        out, "cid long, dim int, n_vecs bigint, centroid_micro bigint"
    )


def embedding_outliers(embeddings: DataFrame) -> DataFrame:
    """Label-purity screen: each vector's squared distance to its label
    centroid, ranked most-distant-first within the label — the screen
    that surfaces mislabeled or degenerate embeddings before training.
    Output: (vec_id, label, d2_micro, outlier_rank).

    Determinism: element and centroid are quantized to integer micros
    first (identical formulas to label_centroids), so the distance is
    exact integer arithmetic — engine- and shuffle-order-independent
    (64-dim micro distances peak ~2.6e14, far inside bigint).

    Scale shape: the centroid relation is (labels x dims) — tiny — and
    broadcasts onto the posexploded vectors; one (vec_id) hash agg
    reduces back to one row per vector. The per-label ranking window
    sorts label-sized partitions of 1-row-per-vector relations, not raw
    vectors; an extreme single-label corpus would make it one sorted
    partition (documented skew caveat, same class as packing_plan)."""
    from pyspark.sql.window import Window

    q = "cast(floor(cast(x as double) * 1000000 + 0.5) as bigint)"
    x = embeddings.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim", "x")
    ).select("vec_id", "label", "dim", F.expr(q).alias("x_micro"))
    cent = label_centroids(embeddings).select("label", "dim", "centroid_micro")
    d = (
        x.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(
                F.expr(
                    "(x_micro - centroid_micro) * (x_micro - centroid_micro)"
                )
            ).alias("d2_micro")
        )
    )
    w = Window.partitionBy("label").orderBy(F.col("d2_micro").desc(), "vec_id")
    return d.withColumn(
        "outlier_rank", F.row_number().over(w).cast("int")
    )


def label_centroids(embeddings: DataFrame) -> DataFrame:
    """Per-label centroid of the embedding column, dimension-exploded —
    the embedding-QA pass of a training-data pipeline (cluster drift,
    label purity, outlier screens all start from these).

    Determinism across engines: each element is quantized to integer
    micros FIRST (floor(x * 1e6 + 0.5), identical formula in the DuckDB
    oracle), so the per-dimension sums are exact integer arithmetic —
    immune to float summation order under shuffles at any parallelism.
    Output: (label, dim, n_vecs, sum_micro, centroid_micro).

    Scale shape: posexplode is a generator (no shuffle); the single
    shuffle keys on (label, dim) with map-side partial aggregation, so
    the shuffle carries one row per (label, dim) per partition — never
    the vectors themselves."""
    e = embeddings.select("label", F.posexplode("embedding").alias("dim", "x"))
    agg = e.groupBy("label", "dim").agg(
        F.sum(
            F.expr("cast(floor(cast(x as double) * 1000000 + 0.5) as bigint)")
        ).alias("sum_micro"),
        F.count(F.lit(1)).alias("n_vecs"),
    )
    return agg.select(
        "label",
        "dim",
        "n_vecs",
        "sum_micro",
        F.expr(
            "cast(floor(cast(sum_micro as double) / n_vecs + 0.5) as bigint)"
        ).alias("centroid_micro"),
    )


SEMANTIC_DUP_THRESHOLD = 0.3  # same scale convention as embedding_near_dup
# Degenerate-cluster guard, same rule as NEAR_DUP_BUCKET_CAP: pair
# generation inside one cluster is capped (keep-rule: smallest vec_ids);
# vectors past the cap are still assigned + kept, just never compared.
SEMANTIC_CLUSTER_CAP = 1000


def micro_vec_rows(embeddings: DataFrame) -> DataFrame:
    """Exploded exact integer-micro vector rows (vec_id, dim, x_micro) —
    the shared input relation of every k-means pass (floor(x*1e6 + 0.5),
    identical formula in the oracle)."""
    q = "cast(floor(cast(x as double) * 1000000 + 0.5) as bigint)"
    return embeddings.select(
        "vec_id", F.posexplode("embedding").alias("dim", "x")
    ).select("vec_id", "dim", F.expr(q).alias("x_micro"))


def _micro_matrix(emb: pd.Series) -> np.ndarray:
    """Exact int64 micro quantization of an embedding batch — the same
    IEEE ops as micro_vec_rows' SQL (floor(double(x) * 1e6 + 0.5))."""
    x = np.stack(emb.to_numpy()).astype(np.float64)
    return np.floor(x * 1_000_000 + 0.5).astype(np.int64)


def _assign_to_centroids(
    embeddings: DataFrame, cids: np.ndarray, cmat: np.ndarray
) -> DataFrame:
    """Exact-int64 Lloyd assignment as a map-side Arrow matmul:
    d2 = |x|^2 - 2 x.c + |c|^2 per (vector, centroid), all in int64
    (micro magnitudes ~1e6, 64 dims -> |d2| <= ~2.6e14, far inside
    int64; the cross term via an int64 matmul is exact, unlike float).
    Ties break to the smallest cid: ``cids`` is sorted ascending and
    np.argmin returns the FIRST minimum — the same (d2, cid)
    lexicographic-min rule the DuckDB oracle states."""
    sc2 = (cmat * cmat).sum(axis=1)

    @F.pandas_udf("long")
    def nearest(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype="int64")
        x = _micro_matrix(emb)
        d2 = (x * x).sum(axis=1)[:, None] - 2 * (x @ cmat.T) + sc2[None, :]
        return pd.Series(cids[np.argmin(d2, axis=1)])

    return embeddings.select(
        "vec_id", nearest(F.col("embedding")).alias("cid")
    )


def _centroid_arrays(centroids: DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Collect a (cid, dim, centroid_micro) relation into (cids sorted
    ascending, k x dims int64 matrix) — k*dims values, the broadcast
    payload of every assignment pass."""
    rows = centroids.select("cid", "dim", "centroid_micro").collect()
    by_cid: dict[int, dict[int, int]] = {}
    for r in rows:
        by_cid.setdefault(r[0], {})[r[1]] = r[2]
    if not by_cid:
        # empty centroid relation (empty corpus): 0 x 0 matrix keeps the
        # eager |c|^2 precompute shape-valid; the assignment UDF only ever
        # sees empty batches in this case
        return np.array([], dtype=np.int64), np.zeros((0, 0), dtype=np.int64)
    cids = np.array(sorted(by_cid), dtype=np.int64)
    cmat = np.array(
        [[by_cid[c][d] for d in sorted(by_cid[c])] for c in cids],
        dtype=np.int64,
    )
    return cids, cmat


def kmeans_assignments(
    embeddings: DataFrame,
    centroids: DataFrame,
    micro_rows: DataFrame | None = None,
) -> DataFrame:
    """Lloyd's assignment step against a FINISHED centroid relation:
    (vec_id, cid) with exact integer-micro squared distances and the
    smallest-cid tiebreak (identical conventions to the in-loop step of
    kmeans_centroids).

    Scale shape: centroids are (k x dims) int64 — closure-broadcast; the
    assignment is one map-side Arrow matmul per batch
    (_assign_to_centroids), no join, no shuffle, and exact."""
    _ = micro_rows  # kept for API compatibility; matmul path needs vectors
    cids, cmat = _centroid_arrays(centroids)
    return _assign_to_centroids(embeddings, cids, cmat)


def cluster_balanced_sample(
    embeddings: DataFrame,
    per_cluster: int = 5,
    k: int | None = None,
    iters: int | None = None,
    total: int | None = None,
) -> DataFrame:
    """Diversity-preserving subset selection: cluster the embeddings with
    the exact integer-micro k-means, then take a FIXED deterministic
    quota from every cluster — the cluster-balanced sampling step a
    curation pipeline runs so that dense regions of embedding space
    (boilerplate, templates, near-duplicates that survived dedup) cannot
    dominate a training subset the way uniform sampling lets them.

    Within a cluster the quota is chosen by md5(vec_id) ascending
    (vec_id tiebreak) — the corpus-order-free, reshuffle-proof choice
    rule the board's train_split/training_negatives use, so re-ingestion
    never changes the sample.

    Scale shape: the k-means pass is the kmeans_centroids plan
    (broadcast centroids, hash aggs, Arrow matmul assignment — no
    shuffle); the quota is one window ranking PARTITIONED BY cluster,
    i.e. a single shuffle keyed on cid with per-group sort. With the
    sqrt-scaled default k (default_kmeans_k) cluster sizes stay
    ~4*sqrt(n), so the per-group sort is bounded far below corpus size;
    a fixed tiny k on a huge corpus would concentrate the sort — pass k
    explicitly only with that in mind.

    Output: (vec_id, cid, rnk), rnk = 1..per_cluster per cluster (fewer
    when the cluster is smaller than the quota)."""
    from pyspark.sql.window import Window

    if total is None:
        total = embeddings.count()
    if k is None:
        k = default_kmeans_k(total)
    if iters is None:
        iters = KMEANS_ITERS
    cent = kmeans_centroids(embeddings, k=k, iters=iters, total=total)
    assign = kmeans_assignments(embeddings, cent)
    h = F.expr(
        "cast(conv(substr(md5(cast(vec_id as string)), 1, 8), 16, 10)"
        " as bigint)"
    )
    w = Window.partitionBy("cid").orderBy(h.asc(), F.col("vec_id").asc())
    return (
        assign.select("vec_id", "cid")
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= int(per_cluster))
    )


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = SEMANTIC_DUP_THRESHOLD,
    k: int | None = None,
    iters: int = KMEANS_ITERS,
    total: int | None = None,
    cluster_cap: int = SEMANTIC_CLUSTER_CAP,
) -> DataFrame:
    """SemDeDup-style semantic pruning (Abbas et al. 2023, public): cluster
    the embeddings with exact integer-micro k-means, compare pairs ONLY
    within a cluster, and drop every vector whose cosine to a smaller-id
    cluster-mate reaches ``threshold`` (greedy keep-smallest-id — one
    deterministic representative per duplicate neighborhood; the keep
    decision uses ALL earlier vectors, matching the one-pass convention of
    dedup.py's keep-rules).

    Scale shape: the k-means pass is the kmeans_centroids plan (broadcast
    centroids, hash aggs); pair generation is cluster-local and capped at
    ``cluster_cap`` rows per cluster, so the worst case is O(k * cap^2)
    pairs — never the O(n^2) cross product. The DEFAULT k scales with the
    corpus via ``default_kmeans_k`` (like IVF's sqrt(n) lists) to hold
    cluster sizes ~flat; a fixed k would silently collapse coverage at
    scale. How much the cap actually truncates is OBSERVABLE via
    semantic_dedup_cap_audit (the "no silent caps" rule) — run it beside
    this on any unfamiliar corpus.

    Output: (vec_id, cid, kept) for EVERY input vector."""
    from pyspark.sql.window import Window

    from ._cache import hold

    if total is None:
        total = embeddings.count()
    if k is None:
        k = default_kmeans_k(total)
    x = hold(micro_vec_rows(embeddings))
    cent = kmeans_centroids(embeddings, k=k, iters=iters, total=total, micro_rows=x)
    assign = kmeans_assignments(embeddings, cent, micro_rows=x)
    tagged = hold(
        embeddings.join(assign, "vec_id").select(
            "vec_id",
            F.col("embedding").alias("v"),
            _norm("embedding").alias("nv"),
            "cid",
        ),
    )
    wcap = Window.partitionBy("cid").orderBy("vec_id")
    capped = (
        tagged.withColumn("rn", F.row_number().over(wcap))
        .filter(F.col("rn") <= cluster_cap)
        .drop("rn")
    )

    # Cluster-local pair comparison as ONE Gram matrix per cluster
    # (applyInPandas): a self-join with a higher-order-function cosine
    # pays an interpreted lambda per (pair, dim) — O(cap^2 * d) lambda
    # calls per cluster; the float64 matmul computes the same cap x cap
    # sim block vectorized. The 1e-6 rounding before the threshold test
    # keeps a summation-order ulp vs the sequential DuckDB oracle from
    # flipping a verdict (the lsh_signatures / ivf_assignments bet). A
    # vec_id is dropped when ANY smaller cluster-mate reaches the
    # threshold (strict upper triangle); zero-norm rows yield NULL
    # cosine in both engines — never a duplicate verdict (NaN -> -inf).
    thr = float(threshold)

    def _gram_drops(pdf: "pd.DataFrame") -> "pd.DataFrame":
        if len(pdf) < 2:
            return pd.DataFrame({"vec_id": []}).astype({"vec_id": "int64"})
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        x = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        norms = np.sqrt((x * x).sum(axis=1))
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = np.round((x @ x.T) / np.outer(norms, norms), 6)
        sims = np.nan_to_num(sims, nan=-np.inf)
        hit = np.triu(sims >= thr, k=1).any(axis=0)
        return pd.DataFrame({"vec_id": ids[hit].astype("int64")})

    dropped = capped.select("cid", "vec_id", "v").groupBy("cid").applyInPandas(
        _gram_drops, schema="vec_id long"
    )
    return (
        tagged.join(
            dropped.withColumn("is_dup", F.lit(True)), "vec_id", "left"
        )
        .select(
            "vec_id",
            "cid",
            (~F.coalesce(F.col("is_dup"), F.lit(False))).alias("kept"),
        )
    )


def semantic_dedup_cap_audit(
    embeddings: DataFrame,
    k: int | None = None,
    iters: int = KMEANS_ITERS,
    total: int | None = None,
    cluster_cap: int = SEMANTIC_CLUSTER_CAP,
) -> DataFrame:
    """Cluster-cap pressure audit for semantic_dedup — the "no silent
    caps" rule: vectors beyond ``cluster_cap`` per cluster are excluded
    from the pairwise comparison (they can still be DROPPED as dups of a
    capped member, but never trigger drops themselves), and THIS relation
    reports how many, per cluster.

    Output: one row per k-means cluster —
    (cid, n_members, n_kept, n_dropped). On a well-spread corpus with the
    scaled default k every n_dropped is 0; a non-zero total says the
    dedup's comparison coverage is being truncated (raise the cap, raise
    k, or pre-split the cluster).

    Scale shape: identical k-means/assignment plan to semantic_dedup
    (broadcast centroids, map-side Arrow matmul) followed by ONE cid
    hash agg — no pair generation, no Gram matrices."""
    from ._cache import hold

    if total is None:
        total = embeddings.count()
    if k is None:
        k = default_kmeans_k(total)
    x = hold(micro_vec_rows(embeddings))
    cent = kmeans_centroids(embeddings, k=k, iters=iters, total=total, micro_rows=x)
    assign = kmeans_assignments(embeddings, cent, micro_rows=x)
    return assign.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.least(F.count(F.lit(1)), F.lit(cluster_cap).cast("bigint")).alias(
            "n_kept"
        ),
        F.greatest(
            F.count(F.lit(1)) - F.lit(cluster_cap).cast("bigint"), F.lit(0).cast("bigint")
        ).alias("n_dropped"),
    )


def quantize_embeddings(embeddings: DataFrame) -> DataFrame:
    """Per-vector scalar quantization of the embedding column to 7-bit
    codes [0, 127] — the memory-reduction pass an ANN index runs at
    100 TB (a float32 corpus shrinks ~4x; IVF/LSH recall degrades only by
    the reconstruction error embedding_quantize_audit reports).

    Scheme (engine-exact across Spark/DuckDB): elements quantize to
    integer micros first, then map [-amax, +amax] -> [0, 127] with
    round-half-up in PURE non-negative integer arithmetic
    (q = ((m + amax) * 127 + amax) div (2 * amax)) — no float divide, no
    negative intdiv (where Spark truncates but DuckDB floors). amax = 0
    (the all-zero vector) quantizes to code 0 by convention.

    Scale shape: posexplode is a generator; the per-vector amax is ONE
    window over the vec_id partitioning — a single shuffle keyed on
    vec_id, rows are (vec_id, dim, bigint). Output: (vec_id, dim, amax,
    q)."""
    from pyspark.sql.window import Window

    e = embeddings.select(
        "vec_id", F.posexplode("embedding").alias("dim", "x")
    ).withColumn(
        "m",
        F.expr("cast(floor(cast(x as double) * 1000000 + 0.5) as bigint)"),
    )
    w = Window.partitionBy("vec_id")
    return (
        e.withColumn("amax", F.max(F.abs("m")).over(w))
        .select(
            "vec_id",
            "dim",
            "amax",
            F.expr(
                "case when amax = 0 then 0"
                " else cast(((m + amax) * 127 + amax) div (2 * amax) as int)"
                " end"
            ).alias("q"),
            "m",
        )
    )


SQ_COARSE_CANDIDATES = 20


def sq_dequantized_vectors(
    vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector bigint arrays of DEQUANTIZED 7-bit codes (integer
    micros) — the compact representation a scalar-quantized ANN index
    stores and scans at 100 TB (~4x smaller than float32). Exact integer
    arithmetic end-to-end (quantize_embeddings' round-half-up mapping,
    then deq = (q * 2 * amax) div 127 - amax, all operands non-negative
    before the subtract), so the DuckDB oracle restates it bit-for-bit.

    Output: (vec_id, dq: array<bigint>) with dims in order."""
    renamed = vectors.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    )
    q = quantize_embeddings(renamed).withColumn(
        "deq",
        F.expr(
            "case when amax = 0 then 0"
            " else (cast(q as bigint) * 2 * amax) div 127 - amax end"
        ),
    )
    return q.groupBy("vec_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim, deq))), s -> s.deq)"
        ).alias("dq")
    )


def sq_rescore_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    coarse: int = SQ_COARSE_CANDIDATES,
) -> DataFrame:
    """Two-stage scalar-quantized ANN — the production shape (FAISS-style
    SQ int8 + refine): a COARSE pass ranks the corpus by the exact-integer
    dot product of dequantized 7-bit codes (the index representation; the
    float corpus is never touched), keeps ``coarse`` candidates per query,
    then a RESCORE pass re-ranks only those with the exact float cosine
    and returns the top ``k``.

    Determinism: the coarse score is pure bigint arithmetic (identical on
    any engine); the rescore uses the 1e-6-rounded cosine with id
    tiebreak, same as brute_force_topk. Scale shape: coarse scans the
    (4x smaller) code arrays with the quantized queries broadcast; the
    rescore join touches only n_queries x coarse float rows.

    Output: (query_id, neighbor_id, rank, cos_sim_r6, coarse_rank)."""
    from pyspark.sql.window import Window

    cd = sq_dequantized_vectors(embeddings).withColumnRenamed(
        "vec_id", "neighbor_id"
    )
    qd = (
        sq_dequantized_vectors(queries, "query_id", "qvec")
        .withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("dq", "qdq")
    )
    coarse_scored = (
        cd.crossJoin(F.broadcast(qd))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.expr(
                "aggregate(zip_with(dq, qdq, (x, y) -> x * y),"
                " 0L, (acc, v) -> acc + v)"
            ).alias("coarse_score"),
        )
    )
    w_coarse = Window.partitionBy("query_id").orderBy(
        F.col("coarse_score").desc(), F.col("neighbor_id")
    )
    cand = (
        coarse_scored.withColumn("coarse_rank", F.row_number().over(w_coarse))
        .filter(F.col("coarse_rank") <= coarse)
        .select("query_id", "neighbor_id", "coarse_rank")
    )
    qf = queries.select(
        "query_id", F.col("qvec").alias("a"), _norm("qvec").alias("na")
    )
    cf = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("b"),
        _norm("embedding").alias("nb"),
    )
    rescored = (
        cand.join(cf, "neighbor_id")
        .join(F.broadcast(qf), "query_id")
        .select(
            "query_id", "neighbor_id", "coarse_rank", _cosine_r6().alias("cos_sim_r6")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim_r6").desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            "cos_sim_r6",
            F.col("coarse_rank").cast("int").alias("coarse_rank"),
        )
    )


#: product-quantization defaults: M subspaces, K codewords per subspace,
#: coarse candidate budget for the rescore stage
PQ_M = 32
PQ_K = 32
PQ_COARSE_CANDIDATES = 20


def pq_codebooks(
    embeddings: DataFrame, k: int = PQ_K, total: int | None = None
) -> DataFrame:
    """The PQ codebook as a relation (cid, dim, c_micro) — the
    strided-seed initialization (the same deterministic convention the
    kmeans/IVF family uses: cid = seed vec_id, stride = total div k),
    shared across every subspace so the derivation is ONE filter of the
    micro-row relation; consumers slice it by sub = dim div dsub.
    ~k*dims rows total — broadcast-sized at any corpus scale (the
    codebook is the model, never corpus-sized). Pass ``total`` when the
    caller already knows the corpus size to skip the count scan."""
    x = micro_vec_rows(embeddings)
    if total is None:
        total = embeddings.count()
    stride = max(1, total // k)
    return (
        x.filter(F.col("vec_id") % stride == 0)
        .select(
            F.col("vec_id").alias("cid"),
            "dim",
            F.col("x_micro").alias("c_micro"),
        )
    )


def pq_adc_table(queries: DataFrame, codebook: DataFrame, dsub: int) -> DataFrame:
    """The per-query ADC table — exact partial dot of each query
    subvector with every codeword subvector (m * n_codes rows per query,
    broadcast-sized at any corpus scale). Shared builder for pq_adc_topk
    and ivfpq_topk; a caller running SEVERAL probe widths over one index
    (ivfpq_probe_recall) builds it ONCE, holds it, and passes it to each
    leg via ``adc_table=`` instead of paying the codebook join per leg
    (r13 verdict #3; guide §3 reuse)."""
    qx = micro_vec_rows(
        queries.select(
            F.col("query_id").alias("vec_id"), F.col("qvec").alias("embedding")
        )
    ).withColumnRenamed("vec_id", "query_id")
    return (
        qx.join(F.broadcast(codebook), "dim")
        .groupBy(
            "query_id", (F.col("dim") / dsub).cast("int").alias("sub"), "cid"
        )
        .agg(F.sum(F.col("x_micro") * F.col("c_micro")).alias("pdot"))
    )


def _pq_dsub(embeddings: DataFrame, m: int) -> int:
    """Subspace width (dims div m), validated — one first() row, never a
    scan."""
    dims = len(embeddings.select("embedding").first()[0])
    if dims % m:
        raise ValueError(f"PQ: {dims} dims not divisible into {m} subspaces")
    return dims // m


def pq_code_rows(
    embeddings: DataFrame,
    m: int = PQ_M,
    n_codes: int = PQ_K,
    codebook: DataFrame | None = None,
    total: int | None = None,
) -> DataFrame:
    """The PQ coding pass (index BUILD): per (vector, subspace) nearest
    codeword by exact bigint squared distance in integer micros, ties to
    the smallest codeword id — (vec_id, sub, cid), m rows per vector.
    The join fans out to n_codes rows per element, collapsed immediately
    by two hash aggs; the codebook side broadcasts. This is the
    corpus-sized pass build_pq_index persists once per corpus so queries
    never re-pay it (FAISS builds IndexIVFPQ once)."""
    dsub = _pq_dsub(embeddings, m)
    x = micro_vec_rows(embeddings)
    seeds = (
        codebook
        if codebook is not None
        else pq_codebooks(embeddings, k=n_codes, total=total)
    )
    d2 = (
        x.join(F.broadcast(seeds), "dim")
        .groupBy(
            "vec_id", (F.col("dim") / dsub).cast("int").alias("sub"), "cid"
        )
        .agg(
            F.sum(
                (F.col("x_micro") - F.col("c_micro"))
                * (F.col("x_micro") - F.col("c_micro"))
            ).alias("d2")
        )
    )
    return (
        d2.groupBy("vec_id", "sub")
        .agg(F.min(F.struct("d2", "cid")).alias("best"))
        .select("vec_id", "sub", F.col("best.cid").alias("cid"))
    )


#: manifest family tag for the PQ/IVF-PQ artifact (_index_commit)
PQ_INDEX_FAMILY = "pq"


class PQIndex:
    """Loaded build_pq_index artifact: the four relations every PQ-family
    query consumes. ``codebook`` (cid, dim, c_micro) and ``ivf_seeds``
    (list_id, a array<double>) are model-sized (broadcastable at any
    corpus scale); ``codes`` (vec_id, sub, cid) and ``assign``
    (vec_id, list_id) are corpus-sized parquet scans.

    ``meta`` carries the build parameters the manifest recorded
    (m, n_codes, n_lists, dims, n_vectors) — consumers validate their
    own m/n_codes against it instead of silently mis-slicing sub
    boundaries (FAISS serializes these with the index for the same
    reason; round-12 ADVICE)."""

    def __init__(
        self,
        codebook: DataFrame,
        codes: DataFrame,
        assign: DataFrame,
        ivf_seeds: DataFrame,
        meta: dict | None = None,
        seed_memo_key: tuple[str, int, int] | None = None,
    ) -> None:
        self.codebook = codebook
        self.codes = codes
        self.assign = assign
        self.ivf_seeds = ivf_seeds
        self.meta = dict(meta or {})
        self._seed_matrix = None
        self._seed_memo_key = seed_memo_key

    def seed_matrix(self):
        """The collected (list_ids, matrix, norms) coarse-quantizer
        triple, memoized on the handle AND — for artifact-backed handles
        — in a session memo keyed on (index dir, manifest version), so a
        board run that loads the same committed index once per query
        pays ONE driver collect per session, not one per handle
        (round-12 verdict #6, widened r13). An append/compact bumps the
        manifest version and a REBUILD refreshes the manifest mtime
        (r14: commit_index_build resets the version to 1, so the mtime
        is what rotates the key there), which evicts the stale entry.
        Seeds are ~isqrt(n) rows, so the held numpy matrix is
        model-sized."""
        if self._seed_matrix is None:
            key = self._seed_memo_key
            hit = _SEED_MATRIX_MEMO.get(key) if key is not None else None
            if hit is not None:
                self._seed_matrix = hit
            else:
                self._seed_matrix = _collect_seed_matrix(self.ivf_seeds)
                if key is not None:
                    for old in [
                        o for o in _SEED_MATRIX_MEMO if o[0] == key[0]
                    ]:
                        del _SEED_MATRIX_MEMO[old]
                    _SEED_MATRIX_MEMO[key] = self._seed_matrix
        return self._seed_matrix


#: session memo of collected coarse-quantizer matrices, keyed on
#: (abspath(index_dir), manifest version, manifest mtime_ns) — see
#: PQIndex.seed_matrix and load_pq_index's staleness note
_SEED_MATRIX_MEMO: dict[tuple[str, int, int], tuple] = {}


def _resolve_index_params(
    index: "PQIndex", m: int | None, n_codes: int | None
) -> tuple[int, int]:
    """Resolve (m, n_codes) against the index's stored build parameters
    — the FAISS contract (round-12 ADVICE): a caller that omits them
    inherits the index's own values (the artifact knows how it was
    built); a caller that passes DIFFERENT ones fails loudly, because a
    wrong ``m`` would slice the query-side ADC table at wrong sub
    boundaries and return silently wrong neighbors."""
    meta = getattr(index, "meta", None) or {}
    if m is None:
        m = meta.get("m", PQ_M)
    elif "m" in meta and meta["m"] != m:
        raise ValueError(
            f"PQ index was built with m={meta['m']} but the caller"
            f" passed m={m}; query-side sub boundaries would be wrong"
        )
    if n_codes is None:
        n_codes = meta.get("n_codes", PQ_K)
    elif "n_codes" in meta and meta["n_codes"] != n_codes:
        raise ValueError(
            f"PQ index was built with n_codes={meta['n_codes']} but the"
            f" caller passed n_codes={n_codes}"
        )
    return m, n_codes


def _ivf_seed_vectors(
    embeddings: DataFrame, n_lists: int | None, total: int | None
) -> DataFrame:
    """The strided IVF seed relation (list_id, a) — the exact seeds
    ivf_assignments derives internally, exposed so multi-probe query
    assignment and the persisted artifact share them."""
    if total is None:
        total = embeddings.count()
    if n_lists is None:
        n_lists = default_n_lists(total)
    stride = max(1, total // n_lists)
    return embeddings.filter(F.col("vec_id") % stride == 0).select(
        F.col("vec_id").alias("list_id"), F.col("embedding").alias("a")
    )


def build_pq_index(
    embeddings: DataFrame,
    out_dir: str,
    m: int = PQ_M,
    n_codes: int = PQ_K,
    n_lists: int | None = None,
    total: int | None = None,
) -> None:
    """Persist the PQ/IVF-PQ index as a parquet ARTIFACT: ``codebook/``
    (the m*n_codes-codeword model), ``codes/`` (the corpus coding pass —
    m one-byte-semantics rows per vector), ``ivf_seeds/`` (the coarse
    quantizer's centroid vectors) and ``ivf_assign/`` (the corpus
    inverted-list assignment). At 100 TB this is the nightly index build;
    pq_adc_topk / ivfpq_topk queries read the artifact instead of
    re-deriving the corpus-sized coding pass per invocation — the
    build_dedup_index / build_graph_index discipline at the ANN rung
    (round-11 verdict #1). Artifact == fresh derivation is a law
    (tests/test_pq.py): every relation here is exact integer/micros
    arithmetic with deterministic ties, and parquet roundtrips bigints
    and float64 exactly.

    The artifact commits through the manifest discipline
    (functions/_index_commit.py): relations land as immutable batch
    dirs and a single atomic ``_CURRENT`` flip publishes them together
    with the build parameters (m, n_codes, n_lists, dims, n_vectors) —
    a crash mid-build leaves no readable index rather than a torn one,
    and every consumer validates its own m/n_codes against the stored
    meta (round-12 verdict #1 + ADVICE)."""
    from ._cache import hold, registry_mark, release_cached_from
    from ._index_commit import commit_index_build

    mark = registry_mark()
    try:
        if total is None:
            total = embeddings.count()
        if n_lists is None:
            n_lists = default_n_lists(total)
        dims = _pq_dsub(embeddings, m) * m
        codebook = hold(pq_codebooks(embeddings, k=n_codes, total=total))
        seeds = hold(_ivf_seed_vectors(embeddings, n_lists, total))
        commit_index_build(
            out_dir,
            writes={
                "codebook": codebook,
                "codes": pq_code_rows(
                    embeddings, m=m, n_codes=n_codes, codebook=codebook
                ),
                "ivf_seeds": seeds,
                "ivf_assign": ivf_assignments(embeddings, seeds=seeds),
            },
            meta={
                "m": m,
                "n_codes": n_codes,
                "n_lists": n_lists,
                "dims": dims,
                "n_vectors": total,
            },
            family=PQ_INDEX_FAMILY,
        )
    finally:
        release_cached_from(mark)


def load_pq_index(spark, index_dir: str) -> PQIndex:
    """Open a build_pq_index artifact lazily (plain parquet scans —
    nothing materializes until a query consumes it). Reads ONLY the
    batch dirs the committed manifest names, so a crashed append's
    orphan batches are refused, never silently scanned."""
    import os

    from ._index_commit import MANIFEST, relation_paths, require_index_manifest

    man = require_index_manifest(index_dir, PQ_INDEX_FAMILY)

    def rel(name: str) -> DataFrame:
        return spark.read.parquet(*relation_paths(index_dir, man, name))

    # memo key carries the manifest file's mtime_ns in addition to the
    # version: commit_index_build RESETS the version to 1 (documented
    # overwrite contract), so a same-session rebuild into the same dir
    # would otherwise hit the previous build's memoized coarse-quantizer
    # matrix (r13 ADVICE #1). Every commit path lands via os.replace,
    # which refreshes the mtime.
    mtime = os.stat(os.path.join(index_dir, MANIFEST)).st_mtime_ns
    return PQIndex(
        codebook=rel("codebook"),
        codes=rel("codes"),
        assign=rel("ivf_assign"),
        ivf_seeds=rel("ivf_seeds"),
        meta=man.get("meta", {}),
        seed_memo_key=(os.path.abspath(index_dir), int(man["version"]), mtime),
    )


def append_pq_index(
    new_embeddings: DataFrame, index_dir: str, m: int | None = None
) -> None:
    """APPEND newly admitted vectors to a persisted build_pq_index
    artifact — the step that closes the ANN ingest loop (screen a batch
    with stream_pq_screen / ivfpq_topk, keep the survivors, append them
    so the NEXT batch probes against today's admissions without a full
    rebuild): the MODEL (codebook + IVF seeds) is frozen from the build
    corpus — exactly FAISS's add-after-train contract — and only the
    batch's code rows and list assignments are computed and appended.
    Cost scales with the increment, never the corpus.

    Equivalence contract (law, tests/test_pq.py): per-vector codes and
    assignments depend only on the vector and the frozen model, so the
    appended artifact holds exactly the rows a from-scratch coding pass
    over (existing UNION new) WITH THE SAME MODEL would.

    Crash-atomic (round-12 verdict #1): both increments land in fresh
    manifest-unreferenced batch dirs and ONE atomic manifest flip
    commits them together (functions/_index_commit.py) — a crash
    between the codes and ivf_assign writes leaves the old version
    readable and the orphans refused/swept, never a
    coded-but-unassigned index. The vec_id-disjointness caller
    contract is ENFORCED, not assumed: an overlapping batch would
    duplicate code rows and silently double summed adc_score, so the
    append fails fast on one broadcast-semi probe of the corpus-sized
    assign relation (round-12 ADVICE). ``m`` is validated against the
    manifest's stored build parameters."""
    from ._cache import hold, registry_mark, release_cached_from
    from ._index_commit import commit_index_append

    spark = new_embeddings.sparkSession
    idx = load_pq_index(spark, index_dir)
    m, _ = _resolve_index_params(idx, m, None)
    mark = registry_mark()
    try:
        batch = hold(new_embeddings)
        n_new = batch.count()
        clash = (
            idx.assign.join(
                F.broadcast(batch.select("vec_id").distinct()), "vec_id"
            )
            .limit(1)
            .collect()
        )
        if clash:
            raise ValueError(
                f"append_pq_index: vec_id {clash[0][0]} is already"
                " indexed — appending it would duplicate code rows and"
                " corrupt ADC scores; screen the batch first"
            )
        commit_index_append(
            index_dir,
            writes={
                "codes": pq_code_rows(batch, m=m, codebook=idx.codebook),
                "ivf_assign": ivf_assignments(
                    batch, seeds=idx.ivf_seeds, seed_matrix=idx.seed_matrix()
                ),
            },
            family=PQ_INDEX_FAMILY,
            meta_update={
                "n_vectors": int(idx.meta.get("n_vectors", 0)) + n_new
            },
        )
    finally:
        release_cached_from(mark)


def ivf_probe_lists(
    queries: DataFrame, seeds: DataFrame, n_probes: int, matrix=None
) -> DataFrame:
    """Multi-probe coarse assignment: the top-``n_probes`` nearest
    inverted lists per query — same 1e-6-rounded cosine and
    smallest-list_id tie rule as ivf_assignments, so probe_rank 1 IS the
    ivf_assignments list (the n_probes=1 ≡ single-probe law). FAISS
    defaults nprobe >= 8 because one probed list is the recall-brittle
    corner of IVF; the engine's LSH rung already multi-probes
    (Hamming-1 buckets). Output: (query_id, list_id), n_probes rows per
    query; seeds broadcast-sized as always. ``matrix`` supplies the
    pre-collected _collect_seed_matrix triple (PQIndex.seed_matrix) so
    a warm artifact path pays no driver round-trip per invocation."""
    list_ids, smat, snorm = (
        matrix if matrix is not None else _collect_seed_matrix(seeds)
    )
    n = min(n_probes, len(list_ids))

    @F.pandas_udf("array<long>")
    def top_lists(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype="object")
        x = np.stack(emb.to_numpy()).astype(np.float64)
        xnorm = np.sqrt((x * x).sum(axis=1))
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = np.round((x @ smat.T) / np.outer(xnorm, snorm), 6)
        # zero-norm query: cosine NULL in both engines, NULLS LAST under
        # DESC -> the probe set falls to the smallest list_ids; -inf
        # under a stable argsort reproduces that exactly
        sims = np.nan_to_num(sims, nan=-np.inf)
        idx = np.argsort(-sims, axis=1, kind="stable")[:, :n]
        return pd.Series([list_ids[row].tolist() for row in idx])

    return queries.select(
        "query_id", F.explode(top_lists(F.col("qvec"))).alias("list_id")
    )


def pq_adc_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int | None = None,
    n_codes: int | None = None,
    coarse: int = PQ_COARSE_CANDIDATES,
    index: PQIndex | None = None,
) -> DataFrame:
    """Two-stage product-quantized ANN with Asymmetric Distance
    Computation — the third rung of the engine's FAISS-style ladder
    (LSH buckets -> IVF lists -> SQ codes -> PQ codes): split each
    vector into ``m`` subspaces, code every subspace to its nearest of
    ``n_codes`` codewords (exact bigint squared distance in integer
    micros, ties to the smallest codeword id), then score a query
    against the CODES ONLY — the classic ADC table of exact partial dot
    products <q_sub, codeword_sub>, summed per vector — keep ``coarse``
    candidates and rescore them with the exact r6-rounded float cosine.

    Why PQ next to SQ: SQ compresses VALUES (7-bit per element, 4x); PQ
    compresses GEOMETRY (one byte per subspace — m bytes per vector,
    8x at m=32/64 dims, more with coarser m), which is what makes billion-vector indexes
    RAM-resident (defaults m=32 1-byte codes per 64-dim float32
    vector: 8x; tuned on the fixture corpus to recall@5 >= 0.94 at the
    default coarse budget — pq_recall_audit reports the number per
    corpus). The codebook (m*k*dsub micros) and the per-query ADC
    table (m*k partial dots) are broadcast-sized at ANY corpus scale;
    the corpus-sized relations are the one-off coding pass (index build)
    and the m-rows-per-vector code relation the query scan reads.

    Determinism across engines/shuffle orders: micros-exact arithmetic
    everywhere before the float rescore; code ties -> smallest cid; ADC
    ties -> smallest neighbor_id; the rescore is the shared r6 cosine
    with id tiebreak. The DuckDB oracle restates the whole chain
    bit-for-bit. Output: (query_id, neighbor_id, rank, cos_sim_r6,
    coarse_rank). Reference seam: beyond-parity (BASELINE.json north
    star, ANN family).

    ``index`` (a load_pq_index PQIndex) swaps the in-query coding pass
    for the persisted artifact's codebook + code relations — the
    production shape: the index builds once per corpus (build_pq_index),
    queries only read it. Artifact == fresh is a law (tests/test_pq.py —
    the coding pass is exact integer arithmetic with deterministic ties,
    and parquet roundtrips bigints exactly)."""
    from pyspark.sql.window import Window

    from ._cache import hold

    if index is not None:
        m, n_codes = _resolve_index_params(index, m, n_codes)
    else:
        m = PQ_M if m is None else m
        n_codes = PQ_K if n_codes is None else n_codes
    dsub = _pq_dsub(embeddings, m)
    if index is not None:
        seeds = index.codebook
        codes = index.codes
    else:
        seeds = pq_codebooks(embeddings, k=n_codes)
        codes = hold(
            pq_code_rows(embeddings, m=m, n_codes=n_codes, codebook=seeds),
        )
    # per-query ADC table: exact partial dot of the query subvector with
    # every codeword subvector — m * n_codes rows per query, broadcast
    adc_tab = pq_adc_table(queries, seeds, dsub)
    scored = (
        codes.join(F.broadcast(adc_tab), ["sub", "cid"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("pdot").alias("adc_score"))
    )
    w_coarse = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id")
    )
    cand = (
        scored.withColumn("coarse_rank", F.row_number().over(w_coarse))
        .filter(F.col("coarse_rank") <= coarse)
        .select("query_id", "neighbor_id", "coarse_rank")
    )
    qf = queries.select(
        "query_id", F.col("qvec").alias("a"), _norm("qvec").alias("na")
    )
    cf = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("b"),
        _norm("embedding").alias("nb"),
    )
    rescored = (
        cand.join(cf, "neighbor_id")
        .join(F.broadcast(qf), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "coarse_rank",
            _cosine_r6().alias("cos_sim_r6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim_r6").desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            "cos_sim_r6",
            F.col("coarse_rank").cast("int").alias("coarse_rank"),
        )
    )


def ivfpq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int | None = None,
    n_codes: int | None = None,
    coarse: int = PQ_COARSE_CANDIDATES,
    n_lists: int | None = None,
    total: int | None = None,
    index: PQIndex | None = None,
    n_probes: int = 1,
    adc_table: DataFrame | None = None,
    codes_lists: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ: the production billion-scale ANN composition (FAISS
    IndexIVFPQ) — the IVF coarse quantizer restricts each query to its
    ``n_probes`` nearest inverted lists (n_probes * corpus/n_lists
    candidates), ADC scores ONLY those candidates from their PQ codes
    (never touching the float corpus), and the exact r6 cosine rescores
    the ``coarse`` survivors.

    This is the capstone of the engine's ANN ladder: ivf_topk bounds the
    scan but reads float vectors; pq_adc_topk reads codes but scans the
    whole corpus; IVF-PQ does both — per query, O(n_probes * corpus /
    n_lists) code rows + the broadcast ADC table, which is what keeps a
    1e9-vector index RAM-resident AND sublinear per query. Same
    determinism conventions as both parents (1e-6-rounded assignment,
    exact-bigint ADC, smallest-id ties); the DuckDB oracle composes the
    two parents' CTE chains verbatim. Output: (query_id, neighbor_id,
    rank, cos_sim_r6, coarse_rank).

    ``index`` (a load_pq_index PQIndex) swaps the in-query coding +
    assignment passes for the persisted artifact — the production shape
    (build once nightly, query many; round-11 verdict #1). ``n_probes``
    widens the coarse probe (ivf_probe_lists — FAISS defaults nprobe>=8;
    one list is the recall-brittle corner): probe_rank 1 is exactly the
    single-probe list, so n_probes=1 reproduces the original relation
    bit-for-bit (law, tests/test_pq.py); ivfpq_probe_recall reports
    recall vs probes."""
    from pyspark.sql.window import Window

    from ._cache import hold

    if index is not None:
        m, n_codes = _resolve_index_params(index, m, n_codes)
    else:
        m = PQ_M if m is None else m
        n_codes = PQ_K if n_codes is None else n_codes
    dsub = _pq_dsub(embeddings, m)
    if index is not None:
        seeds = index.codebook
        assign = index.assign
        code_rows = index.codes
        ivf_seeds = index.ivf_seeds
    else:
        assign = hold(
            ivf_assignments(embeddings, n_lists, total=total)
        )
        seeds = pq_codebooks(embeddings, k=n_codes)
        code_rows = pq_code_rows(
            embeddings, m=m, n_codes=n_codes, codebook=seeds
        )
        ivf_seeds = None
    # ``adc_table`` / ``codes_lists`` let a multi-leg caller
    # (ivfpq_probe_recall) build + hold the query-side ADC table and the
    # corpus-side (codes JOIN assign) relation ONCE across probe widths;
    # each is identical to the in-query derivation by construction, so
    # results are unchanged
    codes = (
        codes_lists if codes_lists is not None
        else code_rows.join(assign, "vec_id")
    )
    adc_tab = (
        adc_table if adc_table is not None
        else pq_adc_table(queries, seeds, dsub)
    )
    if n_probes > 1:
        if ivf_seeds is None:
            ivf_seeds = _ivf_seed_vectors(embeddings, n_lists, total)
        q_assign = ivf_probe_lists(
            queries,
            ivf_seeds,
            n_probes,
            matrix=index.seed_matrix() if index is not None else None,
        )
    else:
        # single-probe: the query's own inverted-list assignment IS its
        # top-1 probe (same argmax) — reuse the corpus relation
        q_assign = queries.join(
            assign, queries.query_id == assign.vec_id
        ).select("query_id", "list_id")
    # inverted-list restriction FIRST (the IVF point: only same-list code
    # rows survive into the ADC lookup), then the broadcast table join
    scored = (
        codes.join(F.broadcast(q_assign), "list_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(adc_tab), ["query_id", "sub", "cid"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("pdot").alias("adc_score"))
    )
    w_coarse = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id")
    )
    cand = (
        scored.withColumn("coarse_rank", F.row_number().over(w_coarse))
        .filter(F.col("coarse_rank") <= coarse)
        .select("query_id", "neighbor_id", "coarse_rank")
    )
    qf = queries.select(
        "query_id", F.col("qvec").alias("a"), _norm("qvec").alias("na")
    )
    cf = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("b"),
        _norm("embedding").alias("nb"),
    )
    rescored = (
        cand.join(cf, "neighbor_id")
        .join(F.broadcast(qf), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "coarse_rank",
            _cosine_r6().alias("cos_sim_r6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim_r6").desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            "cos_sim_r6",
            F.col("coarse_rank").cast("int").alias("coarse_rank"),
        )
    )


def embedding_quantize_audit(embeddings: DataFrame) -> DataFrame:
    """Reconstruction-error observability for quantize_embeddings — the
    per-vector report that tells a deployment whether 7-bit codes are
    safe for its corpus BEFORE the index rebuild: max/total absolute
    error in micros and the relative error in ppm of full scale
    (sum_err / (amax * n_dims)).

    Dequantization mirrors the quantizer in non-negative integer
    arithmetic (deq = (q * 2 * amax) div 127 - amax). Output: (vec_id,
    n_dims, amax, max_err, sum_err, err_ppm), one row per vector."""
    q = quantize_embeddings(embeddings)
    err = q.withColumn(
        "deq",
        F.expr(
            "case when amax = 0 then 0"
            " else (cast(q as bigint) * 2 * amax) div 127 - amax end"
        ),
    ).withColumn("err", F.abs(F.col("m") - F.col("deq")))
    return err.groupBy("vec_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_dims"),
        F.max("amax").alias("amax"),
        F.max("err").alias("max_err"),
        F.sum("err").alias("sum_err"),
        F.expr(
            "case when max(amax) = 0 then 0"
            " else cast(sum(err) * 1000000 div (max(amax) * count(1)) as bigint)"
            " end"
        ).alias("err_ppm"),
    )


def embedding_covariance(embeddings: DataFrame) -> DataFrame:
    """Exact integer second-moment (scatter) matrix of the embedding
    corpus — the distributed reduction behind PCA / whitening / covariance
    analysis. For every dim pair i <= j:

      gram_micro2    = sum over vectors of x_i * x_j   (micro^2 units)
      scatter_micro2 = n * gram - S_i * S_j            (= n^2 * Cov[i,j])

    with x quantized by the engine-wide micro formula (micro_vec_rows /
    _micro_matrix — identical IEEE ops in the oracle), so every value is
    an exact integer and the result is bit-identical under any partition
    or accumulation order.

    Scale shape: one pass over the data as an Arrow-batched mapInPandas
    emitting PER-PARTITION dim x dim int64 partial Gram matrices (a BLAS
    matmul per batch), reduced by a (i, j)-keyed hash agg of
    dim*(dim+1)/2-row partials — the classic outer-product-sum pattern;
    per-dim sums ride the shared exploded relation. No driver collect.

    Overflow bounds (bigint max 9.2e18): unit-normalized micros are
    ~1.25e5 per dim (64-dim), so a gram term is ~1.6e10 — the global sum
    is safe to ~5.7e8 vectors, and n * gram to ~2.4e4 * corpus gram; past
    that scale, shard the reduction by vec_id range and combine the
    per-shard scatters (they are additive) or widen to decimal.

    Output: (i, j, n_vecs, gram_micro2, scatter_micro2), i <= j."""
    from ._cache import hold

    dims = embeddings.select("embedding")

    def partial_gram(batches):
        acc = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = _micro_matrix(pdf["embedding"])
            g = x.T @ x
            acc = g if acc is None else acc + g
        if acc is not None:
            iu = np.triu_indices(acc.shape[0])
            yield pd.DataFrame(
                {"i": iu[0].astype("int32"), "j": iu[1].astype("int32"),
                 "g": acc[iu]}
            )

    gram = dims.mapInPandas(partial_gram, "i int, j int, g long").groupBy(
        "i", "j"
    ).agg(F.sum("g").alias("gram_micro2"))
    m = micro_vec_rows(embeddings)
    sums = hold(
        m.groupBy("dim").agg(F.sum("x_micro").alias("sd"))
    )
    n = embeddings.agg(F.count(F.lit(1)).alias("n_vecs"))
    si = sums.select(F.col("dim").alias("i"), F.col("sd").alias("s_i"))
    sj = sums.select(F.col("dim").alias("j"), F.col("sd").alias("s_j"))
    return (
        gram.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("i").cast("int").alias("i"),
            F.col("j").cast("int").alias("j"),
            F.col("n_vecs").cast("long").alias("n_vecs"),
            F.col("gram_micro2").cast("long").alias("gram_micro2"),
            (
                F.col("n_vecs") * F.col("gram_micro2")
                - F.col("s_i") * F.col("s_j")
            )
            .cast("long")
            .alias("scatter_micro2"),
        )
    )


def pca_components(embeddings: DataFrame, k: int = 8):
    """Top-k principal components of the embedding corpus: the exact
    distributed scatter matrix (embedding_covariance) collected as ONE
    dim x dim matrix — dim^2 rows, a bounded, documented driver touch of
    the same order as the k-means centroid collects — then a driver-side
    numpy eigendecomposition (eigh on a symmetric 64x64 is microseconds;
    the DATA-sized work all happened distributed).

    Eigenvector sign is normalized (largest-|component| entry positive)
    so results are reproducible run to run; eigenvalues are returned in
    descending order. Returns (components, explained) as plain numpy
    arrays: components[k][dim], explained[k] in variance fraction."""
    rows = embedding_covariance(embeddings).collect()
    if not rows:
        return np.zeros((0, 0)), np.zeros(0)
    dim = max(r["j"] for r in rows) + 1
    n = rows[0]["n_vecs"]
    cov = np.zeros((dim, dim), dtype=np.float64)
    for r in rows:
        v = r["scatter_micro2"] / (float(n) * n * 1e12)
        cov[r["i"], r["j"]] = v
        cov[r["j"], r["i"]] = v
    vals, vecs = np.linalg.eigh(cov)
    # the scatter matrix is PSD; eigh's numerical zeros can dip negative
    vals = np.maximum(vals, 0.0)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T.copy()
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1
    total = float(vals.sum()) or 1.0
    return comps, vals[order] / total


def compact_pq_index(spark, index_dir: str) -> int:
    """Fold an append-heavy PQ artifact's per-batch codes/assignment
    dirs into one batch each (functions/_index_commit.py::compact_index
    — plain concatenation: code and assignment rows are per-vector
    facts, so batch structure is storage, not semantics). The model
    relations (codebook, ivf_seeds) are single-batch by construction
    and untouched. Atomic; superseded batches become orphans swept by
    the next commit or vacuum_index."""
    from ._index_commit import compact_index

    return compact_index(spark, index_dir, PQ_INDEX_FAMILY)
