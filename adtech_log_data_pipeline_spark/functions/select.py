"""Data selection via importance resampling (DSIR-style target matching).

Engine-added capability for the 100 TB curation story: given a TARGET
distribution (here: the English slice of the corpus, standing in for
"high-quality reference text") and the RAW corpus, score every document by
how much more likely its tokens are under the target unigram LM than under
the raw-corpus unigram LM, then keep the top-N. This is the hashed-ngram
importance-weighting recipe of DSIR (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling") restated in the board's
integer-exact convention:

* per-token weight = floor(log2(c_target+1)) - floor(log2(c_raw+1)),
  computed as ``length(bin(x))`` bit-length buckets — the same ln-free
  idiom as doc_quality_zipf / bigram_lm_score / bm25, so the DuckDB
  oracle matches bit-for-bit (the corpus-size normalizers of the true
  log-ratio are per-token constants, which shift every document's score
  by weight*n_tokens and are absorbed into the ranking);
* a document's score is the exact bigint SUM of its tokens' weights —
  partial-aggregation order can never flip a bit;
* selection is top-N by (score DESC, doc_id) — no division anywhere, so
  there is no truncation-direction hazard between the engines.

Scale shape: the vocabulary aggregation is ONE pass over the exploded
tokens (conditional count for the target slice rides the same groupBy);
the per-token weight table is vocab-sized and BROADCAST back onto the
token stream; top-N plans as TakeOrderedAndProject (per-partition heaps).
Nothing corpus-sized is ever collected, sorted globally, or windowed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens_col

#: documents kept by the selection query
DSIR_TOP_N = 50

#: the target distribution: the corpus' own English slice
DSIR_TARGET_LANG = "en"


def dsir_selection(
    documents: DataFrame,
    target_lang: str = DSIR_TARGET_LANG,
    top_n: int = DSIR_TOP_N,
) -> DataFrame:
    """Top-``top_n`` documents by integer DSIR importance score against
    the ``target_lang`` slice. Output: (doc_id, n_tokens, sum_weight,
    rank), rank 1..top_n by (sum_weight DESC, doc_id)."""
    toks = documents.select(
        "doc_id",
        "lang",
        F.explode(tokens_col()).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(
        F.count(F.lit(1)).alias("c_raw"),
        F.sum(
            F.when(F.col("lang") == target_lang, F.lit(1)).otherwise(F.lit(0))
        ).alias("c_tgt"),
    )
    # floor(log2(x)) + 1 == length(bin(x)) for x >= 1; the +1s cancel in
    # the difference, so this IS the log2-bucket ratio
    weights = vocab.select(
        "tok",
        (
            F.length(F.expr("bin(c_tgt + 1)")).cast("bigint")
            - F.length(F.expr("bin(c_raw + 1)")).cast("bigint")
        ).alias("wt"),
    )
    scored = (
        toks.join(F.broadcast(weights), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("wt").alias("sum_weight"),
        )
    )
    top = scored.orderBy(
        F.col("sum_weight").desc(), F.col("doc_id")
    ).limit(top_n)
    # rank window runs on the top_n-row result only (bm25_topk discipline)
    w = F.row_number().over(
        Window.orderBy(F.col("sum_weight").desc(), F.col("doc_id"))
    )
    return top.select(
        "doc_id",
        "n_tokens",
        "sum_weight",
        w.cast("int").alias("rank"),
    )
