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


# ---------------------------------------------------------------------------
# hashed-feature linear quality classifier
# ---------------------------------------------------------------------------

#: hashed feature-space width (buckets) for quality_classifier
QC_N_BUCKETS = 512

#: positive proxy-label slice (the reference-corpus convention DSIR uses)
QC_POSITIVE_LANG = "en"


def quality_classifier(
    documents: DataFrame,
    n_buckets: int = QC_N_BUCKETS,
    positive_lang: str = QC_POSITIVE_LANG,
) -> DataFrame:
    """Distributed linear quality-classifier scoring pass — the
    fastText-style hashed bag-of-words scorer every large curation
    pipeline runs between heuristic filtering and selection (the GPT-3 /
    CCNet quality-filter recipe): hash each token into a FIXED number of
    feature buckets, learn one integer weight per bucket from a labeled
    reference slice, score every document by the exact sum of its tokens'
    bucket weights, and classify on the margin's sign.

    Proxy labels, self-contained like dsir_selection's target: positive =
    the ``positive_lang`` slice (standing in for "reference-quality
    text"), negative = the rest. Per-bucket weight = the integer
    log2-bucket class log-odds,

        w_b = bitlen(c_pos_b + 1) - bitlen(c_neg_b + 1)

    (``length(bin(x))`` in both engines — the board's ln-free idiom), and
    a document's margin is the exact bigint sum of w over its token
    OCCURRENCES. pred = 1 iff margin > 0. No division anywhere, so the
    DuckDB oracle hash-matches bit-for-bit.

    The bucket hash is the engine's portable md5 idiom (first 8 hex chars
    as a bigint, mod ``n_buckets``) — reshuffle/reingestion-proof, and
    identical in Spark (conv) and DuckDB ('0x' cast).

    Documents whose token array is empty or NULL (null text) produce no
    exploded rows, so the scored aggregate alone would omit them; a final
    doc-keyed left join back onto ``documents`` restores them with
    n_tokens=0, margin=0, pred=0 — the output really does carry one row
    per document, which is what the quality-score CLI job and any
    downstream keep/drop decision need (an unscored doc must read as
    "not predicted positive", not vanish).

    Why hashed buckets instead of the raw vocabulary: the weight relation
    is ``n_buckets`` rows REGARDLESS of corpus size — at 100 TB the
    vocabulary is billions of tokens and a vocab-keyed weight table stops
    being broadcastable, while the hashed model stays a few KB forever
    (collisions are the accepted fastText trade). The scoring pass is one
    token scan -> bucket hash agg (n_buckets rows after map-side combine)
    -> broadcast weights -> one map-side join + per-doc hash agg. Nothing
    corpus-sized shuffles beyond the doc-keyed aggregation itself.

    Output: (doc_id, lang, n_tokens, margin, pred) for EVERY document.
    """
    toks = _qc_token_buckets(documents, n_buckets)
    weights = quality_weights(
        documents, n_buckets=n_buckets, positive_lang=positive_lang, _toks=toks
    )
    scored = (
        toks.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("wt").cast("bigint").alias("margin"),
        )
    )
    return (
        documents.select("doc_id", "lang")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
            F.coalesce("margin", F.lit(0)).cast("bigint").alias("margin"),
            (F.coalesce("margin", F.lit(0)) > 0).cast("int").alias("pred"),
        )
    )


def _qc_token_buckets(documents: DataFrame, n_buckets: int) -> DataFrame:
    """(doc_id, lang, tok, bucket) token-occurrence rows — the classifier's
    shared feature derivation (portable md5 bucket hash)."""
    return documents.select(
        "doc_id",
        "lang",
        F.explode(tokens_col()).alias("tok"),
    ).withColumn(
        "bucket",
        F.expr(
            "cast(conv(substr(md5(tok), 1, 8), 16, 10) as bigint)"
            f" % {int(n_buckets)}"
        ),
    )


def quality_weights(
    documents: DataFrame,
    n_buckets: int = QC_N_BUCKETS,
    positive_lang: str = QC_POSITIVE_LANG,
    _toks: DataFrame | None = None,
) -> DataFrame:
    """The classifier's learned model as a standalone relation
    (bucket, wt): integer log2-bucket class log-odds per hashed feature
    bucket — at most ``n_buckets`` rows whatever the corpus size, i.e.
    broadcast/collect-sized BY CONSTRUCTION. Exposed so other consumers
    (the streaming ingest scorer) can train once batch-side and apply the
    weights statelessly."""
    toks = _toks if _toks is not None else _qc_token_buckets(documents, n_buckets)
    buckets = toks.groupBy("bucket").agg(
        F.sum(
            F.when(F.col("lang") == positive_lang, F.lit(1)).otherwise(F.lit(0))
        ).cast("bigint").alias("c_pos"),
        F.sum(
            F.when(F.col("lang") == positive_lang, F.lit(0)).otherwise(F.lit(1))
        ).cast("bigint").alias("c_neg"),
    )
    return buckets.select(
        "bucket",
        (
            F.length(F.expr("bin(c_pos + 1)")).cast("bigint")
            - F.length(F.expr("bin(c_neg + 1)")).cast("bigint")
        ).alias("wt"),
    )


# ---------------------------------------------------------------------------
# implicit-feedback negative sampling
# ---------------------------------------------------------------------------

#: candidate catalog slice (most-purchased parts) and negatives per user
NEG_CATALOG = 200
NEG_PER_USER = 3


def training_negatives(
    positives: DataFrame,
    catalog: DataFrame,
    k: int = NEG_PER_USER,
) -> DataFrame:
    """Deterministic implicit-feedback NEGATIVE SAMPLING: for every user
    with at least one positive, pick ``k`` pseudo-random items from the
    candidate catalog that the user has NEVER interacted with — the
    training-pair generator of an implicit-feedback recommender (BPR /
    sampled-softmax negatives), made reshuffle-proof by hashing instead
    of rand(): the choice is a pure function of (user, item), so
    re-ingestion or repartitioning never changes a user's negatives.

    Inputs: ``positives`` = (user_id, part) interactions (duplicates
    tolerated — the per-user collect_set dedupes);
    ``catalog`` = (part) the bounded candidate slice (broadcast-sized —
    popularity-ranked upstream, the standard popularity-biased sampling
    frame). Selection: md5(user:part) ranked ascending per user (item id
    tiebreak), k smallest kept.

    Scale shape (round-13 rework): ONE exchange total. The positives
    aggregate to one row per user (collect_set of interacted parts —
    bounded by the user's history), the broadcast catalog array is
    cross-joined on, and the candidate fan-out happens MAP-SIDE via
    array_except + explode. The output of the user aggregate is already
    clustered on user_id, so the per-user rank window needs NO further
    exchange — the earlier formulation's anti join shuffled the
    users x |catalog| fan-out on (user, part) and then shuffled it BACK
    on user_id for the window (3 full fan-out exchanges -> 0; only the
    user aggregate's positives-sized exchange remains). Window state is
    <= |catalog| rows per user, as before.

    Output: (user_id, part, rnk), rnk = 1..k."""
    cat = catalog.select("part").groupBy().agg(
        F.sort_array(F.collect_set("part")).alias("__cat")
    )
    per_user = positives.groupBy("user_id").agg(
        F.collect_set("part").alias("__pos")
    )
    neg = (
        per_user.crossJoin(F.broadcast(cat))
        .select(
            "user_id",
            F.explode(F.array_except("__cat", "__pos")).alias("part"),
        )
    )
    h = F.expr(
        "cast(conv(substr(md5(concat(cast(user_id as string), ':',"
        " cast(part as string))), 1, 8), 16, 10) as bigint)"
    )
    w = Window.partitionBy("user_id").orderBy(h.asc(), F.col("part").asc())
    return (
        neg.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= int(k))
        .select("user_id", "part", "rnk")
    )


# ---------------------------------------------------------------------------
# leave-one-out target encoding
# ---------------------------------------------------------------------------

#: smoothing pseudo-count and prior (ppm) for target_encode_loo
TE_SMOOTH_M = 20
TE_PRIOR_PPM = 500_000


def target_encode_loo(
    rows: DataFrame,
    m: int = TE_SMOOTH_M,
    prior_ppm: int = TE_PRIOR_PPM,
) -> DataFrame:
    """LEAVE-ONE-OUT target encoding with additive smoothing (the
    CatBoost/Micci-Barreca categorical encoder): each row's category is
    replaced by the smoothed mean target of the OTHER rows of its
    category,

        enc = (sum_y - y_i + prior * m) / (n - 1 + m)

    — excluding the row's own label is what makes the feature
    leakage-safe for training. Stated in exact integer ppm:
    ``enc_ppm = ((sum_y - y) * 1000000 + prior_ppm * m) div (n - 1 + m)``
    with bigint sums, so the DuckDB oracle hash-matches bit-for-bit
    (numerator and denominator are non-negative: n >= 1 and m > 0 keep
    the divisor positive, truncation direction agrees).

    Input: (row_id, category, y) with y in {0,1}. Output: (row_id,
    category, y, enc_ppm).

    Scale shape: ONE category-keyed aggregation (category-sized result)
    broadcast back onto the rows — a map-side join at any row count; no
    window, no per-row state."""
    stats = (
        rows.groupBy("category")
        .agg(
            F.sum("y").cast("bigint").alias("sum_y"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    return (
        rows.join(F.broadcast(stats), "category")
        .select(
            "row_id",
            "category",
            "y",
            F.expr(
                f"((sum_y - y) * 1000000 + {int(prior_ppm)} * {int(m)})"
                f" div (n - 1 + {int(m)})"
            ).cast("bigint").alias("enc_ppm"),
        )
    )
