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
