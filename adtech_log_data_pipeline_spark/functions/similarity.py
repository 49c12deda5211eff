"""Similarity search over the `embeddings` table (vec_id, embedding
array<float>, label) — brute-force cosine top-k as the exact baseline and
a random-hyperplane LSH variant as the scale path (BASELINE.json north
star).

Scale design: brute force is O(queries x corpus) — correct but only
viable when the query set is small or the corpus is pre-filtered; it
broadcasts the query vectors so the corpus never shuffles. The LSH
variant hashes every vector to a signature bucket map-side; the join then
touches only same-bucket pairs (tunable recall via bits/probes). An IVF
variant would follow the same pattern with learned centroids instead of
random hyperplanes.

All math is JVM-side higher-order functions (zip_with/aggregate) in
double precision, accumulated in array order — deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LSH_BITS = 6  # ~corpus/64 vectors per bucket; raise for larger corpora


_DOT = "aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v)"
_NORM = "sqrt(aggregate({v}, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double)))"


def _cosine() -> F.Column:
    return F.expr(
        f"{_DOT} / (({_NORM.format(v='a')}) * ({_NORM.format(v='b')}))"
    )


def brute_force_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    `queries` is (query_id, qvec); the full corpus is scanned once per
    partition with the queries broadcast. Ranking uses the cosine rounded
    to 1e-6 with doc-id tiebreak so results are stable under any float
    summation schedule. Output: (query_id, neighbor_id, rank, cos_sim_r6).
    """
    from pyspark.sql.window import Window

    q = queries.select(F.col("query_id"), F.col("qvec").alias("a"))
    c = embeddings.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("b"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cosine(), 6).alias("cos_sim_r6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim_r6").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim_r6")
    )


def lsh_signatures(embeddings: DataFrame, bits: int = LSH_BITS) -> DataFrame:
    """Random-hyperplane (sign) LSH: bit i = sign(dot(v, h_i)) where h_i is
    a deterministic pseudo-random hyperplane derived from (i, dim) via a
    md5-based weight in [-1, 1].

    Shape: the hyperplane WEIGHTS are a tiny (bits x dim) table built once
    and broadcast; vectors posexplode to (vec, dim, x) rows and two codegen
    hash-aggs produce the signature. The naive nested-lambda form computes
    bits x dim interpreted md5 calls PER VECTOR (~40x slower at sf0.1)."""
    import hashlib

    spark = embeddings.sparkSession
    dim = len(embeddings.select("embedding").first()["embedding"])
    planes = spark.createDataFrame(
        [
            (
                i,
                d,
                int(hashlib.md5(f"{i}:{d}".encode()).hexdigest()[:8], 16)
                / 2147483647.5
                - 1.0,
            )
            for i in range(bits)
            for d in range(dim)
        ],
        "i int, d int, w double",
    )
    n_parts = spark.sparkContext.defaultParallelism
    dims = embeddings.repartition(n_parts, "vec_id").select(
        "vec_id", F.posexplode("embedding").alias("d", "x")
    )
    dots = (
        dims.join(F.broadcast(planes), "d")
        .groupBy("vec_id", "i")
        .agg(F.sum(F.col("x").cast("double") * F.col("w")).alias("dot"))
    )
    bit = F.when(F.col("dot") >= 0, F.expr("shiftleft(1, i)")).otherwise(0)
    return dots.groupBy("vec_id").agg(F.sum(bit).cast("int").alias("bucket"))


def ivf_assignments(embeddings: DataFrame, n_lists: int = 10) -> DataFrame:
    """IVF coarse quantizer: assign every vector to its nearest seed
    centroid. Seeds are a deterministic corpus sample (vec_id % stride == 0
    for ~n_lists seeds) — the stand-in for k-means centroids, keeping the
    whole index oracle-reproducible. Centroids broadcast; assignment is a
    map-side argmax, (vec_id, list_id)."""
    from pyspark.sql.window import Window

    total = embeddings.count()
    stride = max(1, total // n_lists)
    seeds = embeddings.filter(F.col("vec_id") % stride == 0).select(
        F.col("vec_id").alias("list_id"), F.col("embedding").alias("a")
    )
    scored = embeddings.select(
        F.col("vec_id"), F.col("embedding").alias("b")
    ).crossJoin(F.broadcast(seeds)).select(
        "vec_id", "list_id", F.round(_cosine(), 6).alias("sim")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("list_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "list_id")
    )


def ivf_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5, n_lists: int = 10
) -> DataFrame:
    """IVF search: rank candidates only within the query's inverted list
    (n_probes=1). Same output shape as brute_force_topk; at scale the
    inverted lists bound the scan to corpus/n_lists per query — the
    centroid-table sibling of the LSH path."""
    from pyspark.sql.window import Window

    assign = ivf_assignments(embeddings, n_lists)
    corpus = embeddings.join(assign, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("b"), "list_id"
    )
    q = queries.join(assign, queries.query_id == assign.vec_id).select(
        "query_id", F.col("qvec").alias("a"), "list_id"
    )
    scored = (
        corpus.join(F.broadcast(q), "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(_cosine(), 6).alias("cos_sim_r6"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim_r6").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim_r6")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.8
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidate pairs share an LSH
    bucket (sub-quadratic; the full cross product never materializes), then
    the exact cosine filters at `threshold`. Output:
    (vec_a, vec_b, cos_sim_r6) with vec_a < vec_b."""
    sigs = lsh_signatures(embeddings)
    tagged = embeddings.join(sigs, "vec_id")
    left = tagged.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("a"), "bucket"
    )
    right = tagged.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("b"), "bucket"
    )
    return (
        left.join(right, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", F.round(_cosine(), 6).alias("cos_sim_r6"))
        .filter(F.col("cos_sim_r6") >= threshold)
    )


def lsh_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Approximate top-k: rank only within the query's LSH bucket. Same
    output shape as brute_force_topk; recall < 1 by construction."""
    from pyspark.sql.window import Window

    sigs = lsh_signatures(embeddings)
    corpus = embeddings.join(sigs, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("b"), "bucket"
    )
    q = (
        queries.join(sigs, queries.query_id == sigs.vec_id)
        .select("query_id", F.col("qvec").alias("a"), "bucket")
    )
    scored = (
        corpus.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(_cosine(), 6).alias("cos_sim_r6"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim_r6").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim_r6")
    )
