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

    The per-round winner is collected as DRIVER STATE (one 1-row action
    per pick) so the plan stays linear in rounds — the BPE-induction
    discipline; the held candidate/sim relations are k- and k^2-sized,
    so every round is a bounded broadcast job regardless of corpus size.

    Output: (pick, doc_id, rel_micro, max_sim_micro, mmr_score) with
    pick = 1..picks in selection order."""
    from ._cache import hold

    lam = int(lambda_tenths)
    # the held relations are k- and k^2-row: collapse to ONE partition so
    # each greedy round is a single-task job instead of a 32-task scan
    cand = hold(
        candidates.select("doc_id", "rel_micro").coalesce(1), eager=True
    )
    sim = hold(
        sims.select("id_a", "id_b", "sim_micro").coalesce(1), eager=True
    )
    chosen: list[tuple] = []
    chosen_ids: list[int] = []
    for pick in range(1, int(picks) + 1):
        rem = cand
        if chosen_ids:
            rem = cand.filter(~F.col("doc_id").isin(chosen_ids))
            ms = (
                sim.filter(F.col("id_a").isin(chosen_ids))
                .groupBy(F.col("id_b").alias("doc_id"))
                .agg(F.max("sim_micro").alias("max_sim_micro"))
            )
            rem = rem.join(ms, "doc_id", "left").select(
                "doc_id",
                "rel_micro",
                F.coalesce(F.col("max_sim_micro"), F.lit(0)).alias(
                    "max_sim_micro"
                ),
            )
        else:
            rem = rem.select(
                "doc_id", "rel_micro",
                F.lit(0).cast("bigint").alias("max_sim_micro"),
            )
        scored = rem.select(
            "doc_id",
            "rel_micro",
            "max_sim_micro",
            (
                F.lit(lam) * F.col("rel_micro")
                - F.lit(10 - lam) * F.col("max_sim_micro")
            ).cast("bigint").alias("mmr_score"),
        )
        top = scored.orderBy(
            F.col("mmr_score").desc(), F.col("doc_id")
        ).limit(1).collect()
        if not top:
            break
        row = top[0]
        chosen.append(
            (
                pick,
                row["doc_id"],
                row["rel_micro"],
                row["max_sim_micro"],
                row["mmr_score"],
            )
        )
        chosen_ids.append(row["doc_id"])
    spark = candidates.sparkSession
    return spark.createDataFrame(
        chosen,
        "pick int, doc_id long, rel_micro bigint,"
        " max_sim_micro bigint, mmr_score bigint",
    )
