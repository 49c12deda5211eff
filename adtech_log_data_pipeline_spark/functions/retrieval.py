"""Hybrid retrieval: reciprocal-rank fusion of lexical and vector search.

Engine-added capability closing the RAG-retrieval loop over the board's two
ranking primitives: BM25 top-k (functions/text.py::bm25_topk — lexical) and
exact cosine top-k (functions/similarity.py::brute_force_topk — semantic).
Fusion is Reciprocal Rank Fusion (Cormack, Clarke & Buettcher 2009): each
system contributes ``1 / (K + rank)`` with K = 60, which rewards documents
BOTH systems rank high without needing the two score scales to be
comparable — the standard hybrid-search recipe.

Board conventions:

* RRF contributions are integer micros ``1000000 div (60 + rank)`` — the
  fused score is an exact bigint sum, so the DuckDB oracle hash-matches
  bit-for-bit and no float addition order can flip a tie;
* a document missing from one system's top-k contributes 0 from that
  system (the top-k-union formulation — fusion only ever sees the two
  bounded candidate lists, never the corpus);
* final ranking by (rrf_micro DESC, doc_id), rank window applied to the
  fused union only (at most |bm25 top-k| + |cosine top-k| rows).

Scale shape: both inputs are already-bounded top-k relations (each built
scale-consciously by its own operator); the fusion itself is a full outer
join of two k-row relations plus a k-row window — constant cost at any
corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: the RRF smoothing constant (Cormack et al.'s K = 60)
RRF_K = 60

#: fused results kept by the declared query
RRF_TOP_N = 10

#: the query vector for the semantic side of the declared hybrid query
RRF_QUERY_VEC = 0


def hybrid_rrf(
    bm25: DataFrame,
    cosine: DataFrame,
    k: int = RRF_K,
    top_n: int = RRF_TOP_N,
) -> DataFrame:
    """Fuse a BM25 top-k relation (doc_id, ..., rank) with a cosine top-k
    relation (neighbor_id, ..., rank) by integer-micros RRF.

    Output: (doc_id, bm25_rank, cos_rank, rrf_micro, rank) — source ranks
    are 0 where the document is missing from that system's list."""
    b = bm25.select(
        F.col("doc_id").alias("b_id"), F.col("rank").alias("b_rank")
    )
    c = cosine.select(
        F.col("neighbor_id").alias("c_id"), F.col("rank").alias("c_rank")
    )
    fused = b.join(c, F.col("b_id") == F.col("c_id"), "full").select(
        F.coalesce(F.col("b_id"), F.col("c_id")).alias("doc_id"),
        F.coalesce(F.col("b_rank"), F.lit(0)).cast("int").alias(
            "bm25_rank"
        ),
        F.coalesce(F.col("c_rank"), F.lit(0)).cast("int").alias("cos_rank"),
        (
            F.coalesce(F.expr(f"1000000 div ({int(k)} + b_rank)"), F.lit(0))
            + F.coalesce(
                F.expr(f"1000000 div ({int(k)} + c_rank)"), F.lit(0)
            )
        ).cast("bigint").alias("rrf_micro"),
    )
    top = fused.orderBy(F.col("rrf_micro").desc(), F.col("doc_id")).limit(
        top_n
    )
    # rank window runs on the top_n-row result only
    w = F.row_number().over(
        Window.orderBy(F.col("rrf_micro").desc(), F.col("doc_id"))
    )
    return top.select(
        "doc_id", "bm25_rank", "cos_rank", "rrf_micro",
        w.cast("int").alias("rank"),
    )


# ---------------------------------------------------------------------------
# MMR diversity reranking
# ---------------------------------------------------------------------------

#: relevance/diversity trade-off, in tenths (7 -> lambda = 0.7)
MMR_LAMBDA_TENTHS = 7

#: candidates considered (the first-stage top-k) and picks returned
MMR_CANDIDATES = 20
MMR_PICKS = 5


def mmr_rerank(
    candidates: DataFrame,
    sims: DataFrame,
    picks: int = MMR_PICKS,
    lambda_tenths: int = MMR_LAMBDA_TENTHS,
) -> DataFrame:
    """Maximal Marginal Relevance reranking (Carbonell & Goldstein 1998)
    of a bounded candidate list: greedily pick the document maximizing
    ``lambda * relevance - (1 - lambda) * max-similarity-to-picked``, so
    the result set is relevant AND non-redundant — the standard
    diversity pass between retrieval and a context window.

    Inputs: ``candidates`` = (doc_id, rel_micro) — first-stage top-k with
    integer-micros relevance; ``sims`` = (id_a, id_b, sim_micro) pairwise
    candidate similarities (both directions present or symmetric halves —
    only (picked, candidate) lookups are read). All scoring is exact
    integers: mmr = lambda_tenths * rel - (10 - lambda_tenths) * max_sim,
    ties by doc_id.

    The candidate and similarity relations are k- and k^2-sized BY
    CONTRACT (first-stage top-k), so the whole greedy loop runs on
    DRIVER STATE from a single bounded collect of each — the same bound
    the earlier per-round formulation already shipped to the driver one
    row at a time, minus its 2-3 Spark jobs per pick (round-13
    optimization: 24 jobs -> 2 for the declared query; the greedy loop
    itself is O(picks * k) integer compares, microseconds at any corpus
    size because k never scales with the corpus).

    Output: (pick, doc_id, rel_micro, max_sim_micro, mmr_score) with
    pick = 1..picks in selection order."""
    lam = int(lambda_tenths)
    # bounded collects: k and k^2 rows by the top-k contract
    cand_rows = sorted(
        (
            (int(r["doc_id"]), int(r["rel_micro"]))
            for r in candidates.select("doc_id", "rel_micro").collect()
        ),
    )
    sim_map: dict[tuple[int, int], int] = {}
    for r in sims.select("id_a", "id_b", "sim_micro").collect():
        key = (int(r["id_a"]), int(r["id_b"]))
        v = int(r["sim_micro"])
        # duplicate pair rows keep the max — the aggregation semantics of
        # the prior distributed formulation (groupBy(id_b).max)
        if key not in sim_map or v > sim_map[key]:
            sim_map[key] = v

    chosen: list[tuple] = []
    chosen_ids: list[int] = []
    for pick in range(1, int(picks) + 1):
        best: tuple | None = None
        for doc_id, rel in cand_rows:
            if doc_id in chosen_ids:
                continue
            max_sim = max(
                (sim_map.get((c, doc_id), 0) for c in chosen_ids),
                default=0,
            )
            score = lam * rel - (10 - lam) * max_sim
            # ties by doc_id ascending — cand_rows is id-sorted, so the
            # strict > keeps the smallest doc_id among equal scores
            if best is None or score > best[4]:
                best = (pick, doc_id, rel, max_sim, score)
        if best is None:
            break
        chosen.append(best)
        chosen_ids.append(best[1])
    spark = candidates.sparkSession
    return spark.createDataFrame(
        chosen,
        "pick int, doc_id long, rel_micro bigint,"
        " max_sim_micro bigint, mmr_score bigint",
    )
