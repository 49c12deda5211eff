"""Text-analysis operators over the `documents` table — the
training-data-pipeline layer (BASELINE.json north star): token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All operators are pure column expressions (whole-stage codegen; no Python
in the hot path) over `documents(doc_id, text, lang, source, n_chars)`.
At 100 TB these are embarrassingly-parallel map stages — no shuffle at all
except the final aggregation a caller adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Deterministic whitespace tokenization (lower-cased). The BPE-ish variant
# below splits punctuation off as its own tokens.
_WS = r"\s+"

# small marker vocabularies for the language-ID heuristic (distinctive
# function words; ties broken by the fixed en > de > fr > es > zh order)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "you", "that", "it"),
    "de": ("der", "die", "und", "das", "nicht", "ist", "ich", "ein"),
    "fr": ("le", "les", "et", "des", "une", "est", "que", "dans"),
    "es": ("el", "los", "de", "que", "y", "en", "una", "es"),
    "zh": ("de5", "le5", "shi4", "bu4", "wo3", "ni3", "zhe4", "you3"),
}

STOPWORDS = tuple(sorted({w for ws in LANG_MARKERS.values() for w in ws}))

PUNCT_CLASS = r"[.,;:!?'\"()\[\]{}-]"


def tokens_col(text: str = "text") -> Column:
    """Lower-cased whitespace tokens of a non-blank-trimmed text column."""
    return F.split(F.lower(F.trim(F.col(text))), _WS)


def bpe_ish_tokens_col(text: str = "text") -> Column:
    """Token count the way a byte-pair-ish tokenizer would see it: words
    AND punctuation marks as separate tokens (regex pre-split)."""
    spaced = F.regexp_replace(F.lower(F.col(text)), f"({PUNCT_CLASS})", r" $1 ")
    return F.split(F.trim(spaced), _WS)


def text_stats(documents: DataFrame) -> DataFrame:
    """Per-document quality metrics:
      n_tokens, n_tokens_bpe, n_chars_measured, avg_token_len,
      punct_ratio, stopword_ratio, quality_score
    quality_score is a deterministic composite in [0,1]: length band,
    low punctuation noise, presence of function words — the standard
    cheap pretraining-quality heuristics."""
    toks = tokens_col()
    stop_arr = ", ".join(f"'{w}'" for w in STOPWORDS)
    d = documents.select(
        "doc_id",
        toks.alias("toks"),
        F.length(F.col("text")).alias("n_chars_measured"),
        (
            F.length(F.col("text"))
            - F.length(F.regexp_replace(F.col("text"), PUNCT_CLASS, ""))
        ).alias("n_punct"),
        F.size(bpe_ish_tokens_col()).alias("n_tokens_bpe"),
    )
    d = d.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        "n_tokens_bpe",
        "n_chars_measured",
        (
            F.expr("aggregate(toks, 0L, (a, t) -> a + length(t))")
            / F.size("toks")
        ).alias("avg_token_len"),
        # nullif: an empty document must yield NULL (not a div-by-zero NaN
        # that canonicalizes differently across engines)
        (F.col("n_punct") / F.expr("nullif(n_chars_measured, 0)")).alias("punct_ratio"),
        (
            F.expr(f"size(filter(toks, t -> t IN ({stop_arr})))") / F.size("toks")
        ).alias("stopword_ratio"),
    )
    # composite: in-band length (64..4096 chars), low punct, some stopwords
    return d.withColumn(
        "quality_score",
        (
            F.when((F.col("n_chars_measured") >= 64) & (F.col("n_chars_measured") <= 4096), 0.5)
            .otherwise(0.0)
            + F.when(F.col("punct_ratio") <= 0.1, 0.25).otherwise(0.0)
            + F.when(F.col("stopword_ratio") >= 0.05, 0.25).otherwise(0.0)
        ).cast("double"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """N-gram-free language ID: count marker-word hits per language, pick
    the max (ties resolved by the fixed language order). Returns
    (doc_id, lang_declared, lang_pred, marker_hits)."""
    toks = tokens_col()
    d = documents.select("doc_id", F.col("lang").alias("lang_declared"), toks.alias("toks"))
    counts = {
        lang: F.expr(
            "size(filter(toks, t -> t IN ({})))".format(
                ", ".join(f"'{w}'" for w in ws)
            )
        ).alias(f"c_{lang}")
        for lang, ws in LANG_MARKERS.items()
    }
    d = d.select("doc_id", "lang_declared", *counts.values())
    mx = F.greatest(*[F.col(f"c_{lang}") for lang in LANG_MARKERS])
    pred = F.lit("unknown")
    for lang in reversed(list(LANG_MARKERS)):  # first lang wins ties
        pred = F.when((mx > 0) & (F.col(f"c_{lang}") == mx), lang).otherwise(pred)
    return d.select(
        "doc_id", "lang_declared", pred.alias("lang_pred"), mx.cast("int").alias("marker_hits")
    )


def vocab_topk(documents: DataFrame, k: int = 100) -> DataFrame:
    """Corpus vocabulary statistics: the top-k tokens by total occurrence
    count with document frequency — the vocabulary-building / coverage
    pass of a training-data pipeline. Output:
    (token, total_count, doc_freq, rank), rank 1..k, ties broken by token.

    Scale shape: explode -> ONE hash aggregation on the token (map-side
    partial combine does the heavy lifting; the shuffle carries one row
    per distinct token per partition), then a distributed top-k
    (TakeOrderedAndProject — never a global sort of the vocabulary)."""
    toks = documents.select("doc_id", F.explode(tokens_col()).alias("token"))
    agg = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("total_count"),
        F.countDistinct("doc_id").cast("bigint").alias("doc_freq"),
    )
    top = agg.orderBy(F.desc("total_count"), F.asc("token")).limit(k)
    from pyspark.sql.window import Window

    # rank window runs over the k survivors only — single tiny partition
    w = Window.orderBy(F.desc("total_count"), F.asc("token"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


# Deterministic hash split: md5 of the doc id -> bucket 0..99.
SPLIT_TRAIN_PCT = 80
SPLIT_VAL_PCT = 10  # val = buckets [80, 90), test = [90, 100)


def train_split(documents: DataFrame) -> DataFrame:
    """Deterministic, reshuffle-proof train/val/test assignment: bucket =
    md5(doc_id) mod 100 — stable under re-partitioning, re-ingestion and
    corpus growth (a document's split never changes when others are added,
    unlike rand() or row-number splits). Map-only; no shuffle.
    Output: (doc_id, bucket, split)."""
    bucket = F.expr(
        "cast(conv(substr(md5(cast(doc_id as string)), 1, 4), 16, 10) as int) % 100"
    )
    return documents.select("doc_id", bucket.alias("bucket")).select(
        "doc_id",
        "bucket",
        F.when(F.col("bucket") < SPLIT_TRAIN_PCT, "train")
        .when(F.col("bucket") < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, "val")
        .otherwise("test")
        .alias("split"),
    )


def group_split(
    documents: DataFrame, group_col: str = "source"
) -> DataFrame:
    """GROUP-aware train/val/test assignment — the leakage-preventing
    twin of train_split: the split is a pure function of the GROUP key
    (md5(group) mod 100, same cross-engine recipe), so every row of a
    group lands in the same split BY CONSTRUCTION. This is the split a
    training pipeline needs when rows within a group are correlated
    (near-duplicate documents from one source/site/author): a row-level
    split would leak train-set phrasing into val/test and overstate every
    metric. Map-only, no shuffle, reshuffle/ingestion-order-proof.
    Output: one row per kept document — (doc_id, group, bucket, split)."""
    bucket = F.expr(
        "cast(conv(substr(md5(cast("
        + group_col
        + " as string)), 1, 4), 16, 10) as int) % 100"
    )
    return documents.select(
        "doc_id", F.col(group_col).alias("grp"), bucket.alias("bucket")
    ).select(
        "doc_id",
        "grp",
        "bucket",
        F.when(F.col("bucket") < SPLIT_TRAIN_PCT, "train")
        .when(F.col("bucket") < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, "val")
        .otherwise("test")
        .alias("split"),
    )


SAMPLE_TARGET_PER_SOURCE = 15  # approx docs kept per source (binds at sf>=0.01)
SAMPLE_BUCKETS = 1_000_000  # hash-bucket resolution (ppm)


def stratified_sample(
    documents: DataFrame, target_per_source: int = SAMPLE_TARGET_PER_SOURCE
) -> DataFrame:
    """Balanced per-source downsample — the corpus-mixing knob of a
    training pipeline (cap over-represented sources without touching rare
    ones). Deterministic and reshuffle-proof like train_split: a document
    is kept iff its salted-md5 bucket (ppm) falls under its source's keep
    rate, where rate_ppm = ceil(target / n_source * 1e6) capped at 1e6 —
    so sources at-or-under target keep everything, larger sources keep a
    ~target-sized uniform, stable subset (membership never changes when
    OTHER sources grow).

    Scale shape: one small per-source count aggregate broadcast back onto
    a map-only filter — no shuffle of the corpus itself, no window, no
    rand(). Exact integer arithmetic throughout so the DuckDB oracle
    states the identical membership."""
    rates = (
        documents.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_src"))
        .select(
            "source",
            F.least(
                F.lit(SAMPLE_BUCKETS).cast("bigint"),
                F.expr(
                    f"({target_per_source} * {SAMPLE_BUCKETS} + n_src - 1) div n_src"
                ),
            ).alias("rate_ppm"),
        )
    )
    bucket = F.expr(
        "cast(conv(substr(md5(concat('strat:', cast(doc_id as string))), 1, 12), 16, 10)"
        f" as bigint) % {SAMPLE_BUCKETS}"
    )
    return (
        documents.select("doc_id", "source", bucket.alias("bucket_ppm"))
        .join(F.broadcast(rates), "source")
        .filter(F.col("bucket_ppm") < F.col("rate_ppm"))
        .select("doc_id", "source", "bucket_ppm", "rate_ppm")
    )


MIX_BUDGET_PCT = 40  # token budget as % of corpus tokens


def token_budget_mixture(
    documents: DataFrame, budget_pct: int = MIX_BUDGET_PCT
) -> DataFrame:
    """Token-budget mixture sampling — the data-mixing knob stated in
    TOKENS rather than documents: a total budget (``budget_pct`` percent of
    corpus tokens) is split evenly across sources, each source keeps docs
    by hash threshold at rate ≈ its share / its token mass (capped at
    keep-everything). This is how a pretraining run targets "N billion
    tokens, balanced across sources" when sources differ wildly in both
    doc count and doc length — per-DOC stratification (stratified_sample)
    over-weights long-doc sources.

    Scale shape: one small per-source token aggregate + a 1-row corpus
    total, both broadcast back onto a map-only filter — the corpus itself
    never shuffles. Exact integer arithmetic end-to-end (rate in ppm,
    ceil-divides); exact up to ~9e12 corpus tokens (share * 1e6 must fit a
    bigint — switch the one multiply to decimal(38,0) beyond that).
    Output: kept rows (doc_id, source, n_tokens, rate_ppm)."""
    d = documents.select(
        "doc_id", "source", F.size(tokens_col()).alias("n_tokens")
    )
    per_src = d.groupBy("source").agg(F.sum("n_tokens").alias("tok_src"))
    totals = per_src.agg(
        F.sum("tok_src").alias("tok_total"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    rates = (
        per_src.crossJoin(F.broadcast(totals))
        .select(
            "source",
            F.least(
                F.lit(SAMPLE_BUCKETS).cast("bigint"),
                F.expr(
                    f"(((tok_total * {budget_pct}) div 100 div n_sources)"
                    f" * {SAMPLE_BUCKETS} + tok_src - 1) div tok_src"
                ),
            ).alias("rate_ppm"),
        )
    )
    bucket = F.expr(
        "cast(conv(substr(md5(concat('mix:', cast(doc_id as string))), 1, 12), 16, 10)"
        f" as bigint) % {SAMPLE_BUCKETS}"
    )
    return (
        d.withColumn("bucket_ppm", bucket)
        .join(F.broadcast(rates), "source")
        .filter(F.col("bucket_ppm") < F.col("rate_ppm"))
        .select("doc_id", "source", F.col("n_tokens").cast("int").alias("n_tokens"), "rate_ppm")
    )


def doc_quality_zipf(documents: DataFrame) -> DataFrame:
    """Zipf-frequency quality score: the mean log2-bucket of each token's
    CORPUS frequency — a KenLM-style "how typical is this text" signal
    with no model file: gibberish/rare-token documents score low, natural
    in-distribution text scores high. Integer-exact (bit-length instead of
    float log, milli-units integer divide) so the DuckDB oracle matches
    bit-for-bit.

    Scale shape: explode -> one token hash agg (map-side combine carries
    the Zipf head) -> join counts back onto the shared exploded relation
    (held once) -> per-doc agg. The counts join keys on token, where the
    Zipf head is exactly the skew AQE's skew-join split handles; with a
    bounded vocabulary a broadcast of the counts relation removes that
    shuffle entirely. Output: (doc_id, n_tokens, sum_log2, zipf_milli)."""
    from ._cache import hold

    tf = hold(
        documents.select("doc_id", F.explode(tokens_col()).alias("token"))
    )
    counts = tf.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        tf.join(counts, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum(F.length(F.expr("bin(cnt)"))).alias("sum_log2"),
        )
        .select(
            "doc_id",
            F.col("n_tok").cast("int").alias("n_tokens"),
            F.col("sum_log2").cast("bigint").alias("sum_log2"),
            F.expr("(sum_log2 * 1000) div n_tok").alias("zipf_milli"),
        )
    )


def shingle_dup_rate(documents: DataFrame) -> DataFrame:
    """Cross-document duplication diagnostic: for each document, the
    fraction of its DISTINCT 3-gram shingles that also appear in at least
    one other document — the RefinedWeb-style signal that separates
    boilerplate/templated text (high rate) from original text, finer than
    whole-doc dedup and cheaper than pairwise similarity.

    Scale shape: shingle rows (codegen window form, shared via hold) ->
    one shingle-frequency hash agg -> join back -> per-doc agg; shuffles
    carry (doc_id, shingle-hash)-sized rows only. Integer-exact ppm.
    Output: (doc_id, n_shingles, n_dup_shingles, dup_ppm)."""
    from ._cache import hold
    from .dedup import _shingle_rows

    # width-pinned on the shingle hash: one core-count-wide shuffle that
    # the distinct, the frequency agg and the join all reuse (hash on s
    # clusters every consumer's keys), not three shuffle.partitions-wide
    # shuffles of the shingle relation (LOCALGATE_r10 1 GiB-session note)
    width = documents.sparkSession.sparkContext.defaultParallelism
    sh = hold(_shingle_rows(documents).repartition(width, "s").distinct())
    # explicit width re-pin for the agg over the cache: AQE hides the
    # cached plan's partitioning, so without it ENSURE_REQUIREMENTS
    # shuffles the distinct-shingle relation shuffle.partitions-wide
    freq = (
        sh.select("s")
        .repartition(width, "s")
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    return (
        sh.join(freq, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).alias("n_dup"),
        )
        .select(
            "doc_id",
            F.col("n_sh").cast("int").alias("n_shingles"),
            F.col("n_dup").cast("bigint").alias("n_dup_shingles"),
            F.expr(f"(n_dup * {SAMPLE_BUCKETS}) div n_sh").alias("dup_ppm"),
        )
    )


def cross_source_overlap(documents: DataFrame) -> DataFrame:
    """Source-pair contamination matrix: for every pair of sources, how
    many distinct 3-gram shingles they share, plus each side's shingle
    vocabulary size and the pair's Jaccard in ppm — the diagnostic that
    finds mirrored/scraped-from-each-other sources BEFORE per-doc dedup
    spends compute on them.

    Scale shape: distinct (source, shingle) rows (one hash agg), then a
    self-join keyed on shingle — safe from blow-up because each shingle
    joins at most n_sources rows per side (sources, not documents, are
    the join multiplicity), then one (source_a, source_b) hash agg.
    Broadcast per-source totals close it out. Integer-exact ppm.
    Output: (source_a, source_b, shared_shingles, a_shingles, b_shingles,
    jaccard_ppm) for source_a < source_b."""
    from ._cache import hold
    from .dedup import _shingle_rows

    sh = hold(
        _shingle_rows(documents)
        .join(documents.select("doc_id", "source"), "doc_id")
        .select("source", "s")
        .distinct()
    )
    totals = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.select(F.col("source").alias("source_a"), "s")
    b = sh.select(F.col("source").alias("source_b"), "s")
    pairs = (
        a.join(b, "s")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("shared_shingles"))
    )
    ta = totals.select(
        F.col("source").alias("source_a"), F.col("n_shingles").alias("a_shingles")
    )
    tb = totals.select(
        F.col("source").alias("source_b"), F.col("n_shingles").alias("b_shingles")
    )
    return (
        pairs.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a",
            "source_b",
            "shared_shingles",
            "a_shingles",
            "b_shingles",
            F.expr(
                f"(shared_shingles * {SAMPLE_BUCKETS})"
                " div (a_shingles + b_shingles - shared_shingles)"
            ).alias("jaccard_ppm"),
        )
    )


def length_histogram(documents: DataFrame) -> DataFrame:
    """Log2-bucketed token-length histogram per source — the corpus-shape
    report read before choosing context length and packing strategy.
    bucket = floor(log2(n_tokens)) stated as integer bit arithmetic
    (length of the binary representation minus 1) so both engines bucket
    identically with no float log. Map + one small hash agg; output:
    (source, bucket, lo_tokens, n_docs, total_tokens)."""
    d = documents.select(
        "source", F.size(tokens_col()).alias("n_tokens")
    ).select(
        "source",
        "n_tokens",
        # floor(log2(x)) for x >= 1 == bit_length(x) - 1, via bin();
        # degenerate n_tokens < 1 lands in bucket -1
        F.when(F.col("n_tokens") < 1, F.lit(-1))
        .otherwise(F.length(F.expr("bin(n_tokens)")) - 1)
        .alias("bucket"),
    )
    return (
        d.groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .select(
            "source",
            F.col("bucket").cast("int").alias("bucket"),
            F.expr(
                "cast(case when bucket < 0 then 0 else shiftleft(1L, bucket) end as bigint)"
            ).alias("lo_tokens"),
            "n_docs",
            "total_tokens",
        )
    )


CURATE_MIN_TOKENS = 20


def curated_corpus(
    documents: DataFrame,
    target_per_source: int = SAMPLE_TARGET_PER_SOURCE,
    min_tokens: int = CURATE_MIN_TOKENS,
) -> DataFrame:
    """The end-to-end curation composition — what a training-data pipeline
    actually ships: a document survives iff it is (a) its exact-dup
    group's representative (longest raw text, doc_id tiebreak), (b) inside
    its source's balanced sample, and (c) above the token-length quality
    floor; survivors carry their deterministic train/val/test split.
    Output: (doc_id, source, split, n_tokens).

    Fused single-scan shape (NOT a join of the three standalone
    operators): every per-document column — token count, content hash,
    sample bucket, split bucket — comes from one projection of one corpus
    scan; the only corpus shuffle is the content-hash window for
    representative selection, and the per-source rates arrive as a
    broadcast of a column-pruned count aggregate. The standalone
    operators remain the oracle-checked building blocks; this plan is the
    production composition of the same formulas (hash-compared end-to-end
    by ITS own oracle)."""
    return (
        _curation_flags(documents, target_per_source)
        .filter(
            (F.col("rn") == 1)
            & (F.col("bucket_ppm") < F.col("rate_ppm"))
            & (F.col("n_tokens") >= min_tokens)
        )
        .select(
            "doc_id",
            "source",
            F.when(F.col("sbucket") < SPLIT_TRAIN_PCT, "train")
            .when(F.col("sbucket") < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, "val")
            .otherwise("test")
            .alias("split"),
            "n_tokens",
        )
    )


def _curation_flags(
    documents: DataFrame, target_per_source: int = SAMPLE_TARGET_PER_SOURCE
) -> DataFrame:
    """The shared single-scan projection behind curated_corpus and
    curation_funnel: per doc — token count, exact-dup representative rank
    (rn), sample bucket vs broadcast per-source rate, split bucket."""
    from pyspark.sql.window import Window

    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    split_bucket = F.expr(
        "cast(conv(substr(md5(cast(doc_id as string)), 1, 4), 16, 10) as int) % 100"
    )
    sample_bucket = F.expr(
        "cast(conv(substr(md5(concat('strat:', cast(doc_id as string))), 1, 12), 16, 10)"
        f" as bigint) % {SAMPLE_BUCKETS}"
    )
    base = documents.select(
        "doc_id",
        "source",
        F.size(tokens_col()).alias("n_tokens"),
        F.md5(norm.cast("binary")).alias("content_hash"),
        F.length("text").alias("raw_len"),
        sample_bucket.alias("bucket_ppm"),
        split_bucket.alias("sbucket"),
    )
    rates = (
        documents.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_src"))
        .select(
            "source",
            F.least(
                F.lit(SAMPLE_BUCKETS).cast("bigint"),
                F.expr(
                    f"({target_per_source} * {SAMPLE_BUCKETS} + n_src - 1) div n_src"
                ),
            ).alias("rate_ppm"),
        )
    )
    w = Window.partitionBy("content_hash").orderBy(
        F.col("raw_len").desc(), F.col("doc_id")
    )
    return base.withColumn("rn", F.row_number().over(w)).join(
        F.broadcast(rates), "source"
    )


def curation_funnel(
    documents: DataFrame,
    target_per_source: int = SAMPLE_TARGET_PER_SOURCE,
    min_tokens: int = CURATE_MIN_TOKENS,
) -> DataFrame:
    """Funnel observability over the curation composition: cumulative
    survivor doc/token counts after each stage — corpus -> exact-dedup
    representative -> quality floor -> balanced sample -> per-split — the
    per-stage drop report a pipeline operator reads before shipping a
    corpus (which stage ate the tokens?).

    One conditional-count pass over the shared _curation_flags projection
    (same single corpus scan + content-hash window as curated_corpus), a
    1-row aggregate unpivoted JVM-side with stack(); no extra shuffle
    beyond what curated_corpus itself needs.

    Output: (stage, stage_idx, n_docs, n_tokens), 7 rows."""
    flags = _curation_flags(documents, target_per_source)
    keep1 = F.col("rn") == 1
    keep2 = keep1 & (F.col("n_tokens") >= min_tokens)
    keep3 = keep2 & (F.col("bucket_ppm") < F.col("rate_ppm"))
    stages = [
        ("corpus", F.lit(True)),
        ("dedup_keep_best", keep1),
        ("quality_floor", keep2),
        ("balanced_sample", keep3),
        ("split_train", keep3 & (F.col("sbucket") < SPLIT_TRAIN_PCT)),
        (
            "split_val",
            keep3
            & (F.col("sbucket") >= SPLIT_TRAIN_PCT)
            & (F.col("sbucket") < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT),
        ),
        (
            "split_test",
            keep3 & (F.col("sbucket") >= SPLIT_TRAIN_PCT + SPLIT_VAL_PCT),
        ),
    ]
    aggs = []
    for i, (_, cond) in enumerate(stages):
        aggs.append(F.sum(cond.cast("bigint")).alias(f"d{i}"))
        aggs.append(
            F.sum(F.when(cond, F.col("n_tokens")).otherwise(0)).alias(f"t{i}")
        )
    one = flags.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', {i}, d{i}, t{i}" for i, (name, _) in enumerate(stages)
    )
    return one.selectExpr(
        f"stack({len(stages)}, {stack_args})"
        " as (stage, stage_idx, n_docs, n_tokens)"
    ).select(
        "stage",
        F.col("stage_idx").cast("int").alias("stage_idx"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
    )


CONTAM_EVAL_MOD = 97  # doc_id % 97 == 0 -> held-out "benchmark" docs


def contamination_check(documents: DataFrame) -> DataFrame:
    """Benchmark-contamination screen: how much of each training document's
    3-gram shingle set also appears in the held-out eval set (here the
    deterministic pseudo-benchmark doc_id % CONTAM_EVAL_MOD == 0; in
    production the eval side is the real benchmark corpus). Output per
    train doc: (doc_id, n_shingles, n_contaminated, contamination_r6).

    Scale shape: the distinct shingle relation materializes once and feeds
    all three consumers; the eval shingle set is benchmark-sized and
    broadcast, so the corpus never shuffles for the probe join — the
    whole check is scan + hash-agg shaped."""
    from ._cache import hold
    from .dedup import _shingle_rows

    sh = hold(_shingle_rows(documents).distinct())
    eval_sh = (
        sh.filter(F.col("doc_id") % CONTAM_EVAL_MOD == 0).select("s").distinct()
    )
    train = sh.filter(F.col("doc_id") % CONTAM_EVAL_MOD != 0)
    tot = train.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        train.join(F.broadcast(eval_sh), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return (
        tot.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
        )
        .withColumn(
            "contamination_r6",
            F.round(F.col("n_contaminated") / F.col("n_shingles"), 6),
        )
    )


# PII patterns chosen to behave identically under Java regex (Spark) and
# RE2 (DuckDB): no backreferences, no lookaround.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}"


def pii_redact(documents: DataFrame) -> DataFrame:
    """PII scrubbing: replace emails / IPv4 addresses / phone numbers with
    typed placeholder tags, reporting per-document match counts and the
    md5 of the redacted text (so the full redaction output is
    hash-verified without shipping the text through the compare). Order:
    emails, then IPs, then phones (emails may contain digit runs; IPs
    must be consumed before the looser phone pattern can touch them).
    Pure map stage — the 100 TB shape is a rewrite pass fused into the
    scan."""
    redacted = F.col("text")
    for pat, tag in ((PII_EMAIL, "<EMAIL>"), (PII_IPV4, "<IP>"), (PII_PHONE, "<PHONE>")):
        redacted = F.regexp_replace(redacted, pat, tag)
    return documents.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(PII_EMAIL), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(PII_IPV4), 0)).alias("n_ips"),
        F.size(F.regexp_extract_all("text", F.lit(PII_PHONE), 0)).alias("n_phones"),
        F.md5(redacted.cast("binary")).alias("redacted_hash"),
        F.length(redacted).alias("redacted_len"),
    )


WINNOW_WINDOW = 4  # consecutive shingle hashes per winnowing window


def winnowing_fingerprints(documents: DataFrame) -> DataFrame:
    """Winnowing (rolling-hash) fingerprints: hash every word 3-gram
    shingle, slide a window of WINNOW_WINDOW consecutive hashes, keep each
    window's minimum — the classic local-fingerprinting scheme that
    guarantees shared substrings of sufficient length produce shared
    fingerprints. Output: distinct (doc_id, fp bigint).

    All codegen: shingle rows via window lead(), hash via md5 prefix, the
    rolling minimum via a frame-bounded window min."""
    from pyspark.sql.window import Window

    from .dedup import _shingle_rows_with_pos

    sh = _shingle_rows_with_pos(documents).select(
        "doc_id",
        "pos",
        F.expr("cast(conv(substr(md5(cast(s as binary)), 1, 8), 16, 10) as bigint)").alias("h"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, WINNOW_WINDOW - 1)
    )
    n = Window.partitionBy("doc_id")
    return (
        sh.withColumn("win_min", F.min("h").over(w))
        .withColumn("n_sh", F.count(F.lit(1)).over(n))
        # only complete windows (or the single short-doc window)
        .filter(
            (F.col("pos") <= F.col("n_sh") - WINNOW_WINDOW) | (F.col("pos") == 0)
        )
        .select("doc_id", F.col("win_min").alias("fp"))
        .distinct()
    )


def doc_fingerprints(documents: DataFrame) -> DataFrame:
    """Deterministic fingerprints per document:
      content_hash  — md5 of whitespace-normalized lower-cased text
      vocab_hash    — md5 of the sorted DISTINCT token set (bag-of-words
                      signature: equal iff same vocabulary, a cheap
                      near-dup blocker)
      min_token_hash — min over md5(token) (1-permutation MinHash)
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), _WS, " ")
    return documents.select(
        "doc_id", norm.alias("norm"), tokens_col().alias("toks")
    ).select(
        "doc_id",
        F.md5(F.col("norm").cast("binary")).alias("content_hash"),
        F.md5(
            F.concat_ws("\x1f", F.array_sort(F.array_distinct(F.col("toks")))).cast(
                "binary"
            )
        ).alias("vocab_hash"),
        F.expr("array_min(transform(toks, t -> md5(cast(t as binary))))").alias(
            "min_token_hash"
        ),
    )


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Gopher-style repetition screens — the standard pretraining-corpus
    quality gates for boilerplate/templated text:
      dup_line_frac   — 1 - distinct/total over newline-split lines
      dup_token_frac  — 1 - distinct/total over whitespace tokens
      top_bigram, top_bigram_cnt, top_bigram_frac — the most frequent word
        2-gram and its share of all bigrams (ties -> lexicographically
        smallest bigram; NULL for docs with < 2 tokens)

    Scale shape: the line/token fractions are map-only array expressions;
    the bigram mode is explode -> (doc_id, bigram) codegen hash agg ->
    per-doc min(struct(-cnt, bigram)) — two shuffles keyed by doc_id, no
    windows over raw rows."""
    toks = tokens_col()
    lines = F.split(F.col("text"), "\n")
    base = documents.select(
        "doc_id",
        F.size(lines).alias("n_lines"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct(lines))
            / F.expr("nullif(size(split(text, '\n')), 0)")
        ).alias("dup_line_frac"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct(toks)) / F.size(toks)
        ).alias("dup_token_frac"),
        toks.alias("toks"),
    )
    bigrams = base.select(
        "doc_id",
        F.explode(
            # CASE guard: sequence(1, 0) would generate a DESCENDING [1, 0]
            # for single-token docs, not an empty list
            F.expr(
                "CASE WHEN size(toks) < 2 THEN array()"
                " ELSE transform(sequence(1, size(toks) - 1),"
                " i -> concat(toks[i - 1], ' ', toks[i])) END"
            )
        ).alias("bg"),
    )
    per_bg = bigrams.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("cnt"))
    top = per_bg.groupBy("doc_id").agg(
        F.min(F.struct((-F.col("cnt")).alias("neg"), F.col("bg"))).alias("t"),
        F.sum("cnt").alias("total_bg"),
    )
    return (
        base.drop("toks")
        .join(top, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            "dup_line_frac",
            "dup_token_frac",
            F.col("t.bg").alias("top_bigram"),
            (-F.col("t.neg")).cast("bigint").alias("top_bigram_cnt"),
            ((-F.col("t.neg")) / F.col("total_bg")).alias("top_bigram_frac"),
        )
    )


TFIDF_TOP_K = 5


def tfidf_top_terms(documents: DataFrame, k: int = TFIDF_TOP_K) -> DataFrame:
    """Per-document top-k terms by tf-idf with a log-free idf,
    tfidf = tf * (N + 1) / (df + 1) — rank-equivalent to the log form for
    any fixed term and, unlike ln(), bit-identical across engines (integer
    products under 2^53 and one correctly-rounded IEEE division).
    Output: (doc_id, term, tf, df, tfidf, rank), rank 1..k, ties broken by
    term.

    Scale shape: ONE explode -> (doc_id, term) codegen hash agg, persisted
    and shared by the df aggregation (count of docs per term = rows per
    term here) and the scoring join; N comes from a 1-row aggregate
    broadcast onto the term rows — no driver-side count during plan
    construction. Top-k is a bounded per-doc window over already-aggregated
    rows."""
    from pyspark.sql.window import Window

    from ._cache import hold

    tf = hold(
        documents.select("doc_id", F.explode(tokens_col()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf")),
        # lazy hold (r13): the first consumer's action fills the cache;
        # concurrent fills are serialized per partition by the block
        # manager, so an upfront count is pure added latency (see hold())
    )
    df_rel = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = documents.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_rel, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (F.col("tf") * (F.col("n_docs") + 1) / (F.col("df") + 1)).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


PCTS = (25, 50, 75, 90, 99)


def length_percentiles(documents: DataFrame) -> DataFrame:
    """Exact discrete token-length percentiles per source — the corpus
    length-distribution report that drives truncation/packing choices.
    percentile_disc semantics: the smallest value whose cumulative rank
    reaches p, i.e. the element at rank ceil(p * n).

    Scale shape: NOT the builtin exact percentile aggregate (which
    collects every group's values into one aggregation buffer — a
    scale-killer for big groups). Instead rank rows with a window sort
    (distributed, spillable) and pick the ceil(p*n) ranks — one shuffle
    keyed by source, memory bounded by a partition, any group size.
    Output: (source, pct, n_docs, n_tokens_p)."""
    sized = documents.select(
        "source", F.size(tokens_col()).cast("bigint").alias("n_tokens"), "doc_id"
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("source").orderBy("n_tokens", "doc_id")
    ranked = sized.select(
        "source",
        "n_tokens",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n_docs"),
    )
    # one generator pass over the single ranked relation (a union of
    # per-percentile filters would re-run the window sort once per pct)
    pcts = F.array(*[F.lit(p) for p in PCTS])
    return (
        ranked.select(
            "source", "n_tokens", "rn", "n_docs", F.explode(pcts).alias("pct")
        )
        .filter(F.col("rn") == F.ceil(F.col("n_docs") * F.col("pct") / 100.0))
        .select(
            "source",
            F.col("pct").cast("int").alias("pct"),
            "n_docs",
            F.col("n_tokens").alias("n_tokens_p"),
        )
    )


def source_mix(documents: DataFrame) -> DataFrame:
    """Corpus composition report: per (source, lang) document count, token
    total, and share of the corpus by docs and by tokens — the data-mix
    summary every pretraining run is planned around.

    Scale shape: one codegen hash agg to (source, lang) partials, then the
    corpus totals come from a second tiny agg broadcast back — the fact
    table is scanned once and the shuffle carries one row per group per
    partition."""
    from ._cache import hold

    per = hold(
        documents.groupBy("source", "lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(tokens_col()).cast("bigint")).alias("n_tokens"),
        ),
        # lazy hold (r13): the totals aggregate and the share projection both read
        # this (tiny) relation — without it the corpus scan runs twice
    )
    totals = per.agg(
        F.sum("n_docs").alias("t_docs"), F.sum("n_tokens").alias("t_tokens")
    )
    return (
        per.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "lang",
            "n_docs",
            "n_tokens",
            (F.col("n_docs") / F.col("t_docs")).alias("doc_share"),
            (F.col("n_tokens") / F.col("t_tokens")).alias("token_share"),
        )
    )


PACK_CTX_TOKENS = 2048


def packing_plan(documents: DataFrame, ctx: int = PACK_CTX_TOKENS) -> DataFrame:
    """Sequence-packing plan: assign documents to fixed-capacity context
    windows by running token count in deterministic (source, doc_id) order
    — the packing manifest a pretraining data loader consumes. A document
    starts in the pack where its cumulative predecessor tokens land
    (contiguous fill; long docs span packs and the loader splits them at
    the recorded offset). Output:
      (doc_id, source, n_tokens, cum_before, pack_id, pack_offset)
    pack_id is globally unique as (source-local pack index, source).

    Scale shape: the running sum is a window per SOURCE (orderBy doc_id),
    so the sort distributes across sources rather than one global
    ordering; within a source the window is a single sort-based pass.
    For a single giant source, shard the key (source, doc_id mod K) first
    — same plan shape."""
    from pyspark.sql.window import Window

    sized = documents.select(
        "doc_id", "source", F.size(tokens_col()).cast("bigint").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return sized.select(
        "doc_id",
        "source",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("cum_before"),
    ).select(
        "doc_id",
        "source",
        "n_tokens",
        "cum_before",
        F.floor(F.col("cum_before") / ctx).cast("bigint").alias("pack_id"),
        (F.col("cum_before") % ctx).cast("bigint").alias("pack_offset"),
    )


# Context-window chunking defaults: 64-token chunks with a 16-token
# overlap (stride 48) — the shape every RAG/pretraining chunker uses,
# scaled down to the synthetic corpus' doc lengths.
CHUNK_TOKENS = 64
CHUNK_OVERLAP = 16


def doc_chunks(
    documents: DataFrame,
    chunk_tokens: int = CHUNK_TOKENS,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """Token-aware overlapping document chunking: split each document into
    ``chunk_tokens``-token windows advancing by ``chunk_tokens - overlap``
    so adjacent chunks share ``overlap`` tokens of context; the last chunk
    may be shorter. Chunk count is exact integer math —
    max(1, ceildiv(n - overlap, stride)) — so every doc (including empty)
    emits at least one chunk and no chunk is fully contained in the
    previous one.

    Scale shape: one corpus scan, a JVM-side sequence fan-out (Generate,
    no shuffle, no Python), and per-chunk slices of the already-built
    token array — the chunk text never materializes, only its md5
    fingerprint and token count leave the operator.

    Output: (doc_id, chunk_id, chunk_start, n_chunk_tokens, chunk_hash).
    """
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("chunk_tokens must exceed overlap")
    t = documents.select(
        "doc_id", tokens_col().alias("toks")
    ).withColumn("n", F.size("toks"))
    k = F.expr(
        f"greatest(1L, cast((n - {overlap} + {stride} - 1) as bigint) div {stride})"
    )
    chunks = (
        t.withColumn("k", k)
        .select(
            "doc_id",
            "toks",
            F.posexplode(F.expr("sequence(0L, k - 1)")).alias("chunk_id", "_s"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            (F.col("_s") * stride).cast("bigint").alias("chunk_start"),
            F.expr(
                f"slice(toks, cast(_s as int) * {stride} + 1, {chunk_tokens})"
            ).alias("chunk"),
        )
    )
    # chr(31) array-joining convention shared with vocab_hash (oracle:
    # array_to_string(..., chr(31)))
    return chunks.select(
        "doc_id",
        "chunk_id",
        "chunk_start",
        F.size("chunk").alias("n_chunk_tokens"),
        F.md5(F.concat_ws("\u001f", "chunk").cast("binary")).alias("chunk_hash"),
    )


TEMPERATURE_BUDGET_PCT = 40  # expected kept-token mass, % of corpus


def temperature_mix(
    documents: DataFrame, budget_pct: int = TEMPERATURE_BUDGET_PCT
) -> DataFrame:
    """Temperature-based mixture sampling (alpha = 0.5 exponentiated
    smoothing, the multilingual-corpus reweighting rule): each source's
    share of the token budget is proportional to sqrt(its token mass)
    instead of its token mass, so small sources are up-weighted and huge
    sources down-weighted — the standard fix for a head-heavy corpus
    where proportional sampling starves the tail.

    Determinism across engines: sqrt of a bigint-as-double is a single
    correctly-rounded IEEE op, quantized to milli-units BEFORE the
    normalizing sum so the sum is exact integer arithmetic (a double
    sum over sources would be order-dependent under shuffles). Exact
    while budget * q_milli fits a bigint — corpora to ~4e10 tokens;
    switch the two products to decimal(38,0) beyond that.

    Scale shape: identical to token_budget_mixture — per-source
    aggregate + 1-row total broadcast onto a map-only filter; the corpus
    never shuffles.
    Output: kept rows (doc_id, source, n_tokens, rate_ppm)."""
    d = documents.select(
        "doc_id", "source", F.size(tokens_col()).alias("n_tokens")
    )
    per_src = d.groupBy("source").agg(F.sum("n_tokens").alias("tok_src"))
    q = per_src.select(
        "source",
        "tok_src",
        F.expr(
            "cast(floor(sqrt(cast(tok_src as double)) * 1000 + 0.5) as bigint)"
        ).alias("q_milli"),
    )
    totals = q.agg(
        F.sum("q_milli").alias("s_milli"),
        F.sum("tok_src").alias("tok_total"),
    )
    rates = q.crossJoin(F.broadcast(totals)).select(
        "source",
        F.least(
            F.lit(SAMPLE_BUCKETS).cast("bigint"),
            F.expr(
                f"((((tok_total * {budget_pct}) div 100 * q_milli) div s_milli)"
                f" * {SAMPLE_BUCKETS} + tok_src - 1) div tok_src"
            ),
        ).alias("rate_ppm"),
    )
    bucket = F.expr(
        "cast(conv(substr(md5(concat('temp:', cast(doc_id as string))), 1, 12), 16, 10)"
        f" as bigint) % {SAMPLE_BUCKETS}"
    )
    return (
        d.withColumn("bucket_ppm", bucket)
        .join(F.broadcast(rates), "source")
        .filter(F.col("bucket_ppm") < F.col("rate_ppm"))
        .select(
            "doc_id",
            "source",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            "rate_ppm",
        )
    )


OOV_VOCAB_K = 50


def oov_rate(documents: DataFrame, vocab_k: int = OOV_VOCAB_K) -> DataFrame:
    """Vocabulary coverage per source: the fraction of token OCCURRENCES
    falling outside the global top-``vocab_k`` vocabulary — the
    tokenizer-coverage screen run before committing a vocab to a
    training run. Output: (source, n_tokens, n_oov, oov_ppm), ppm as
    exact integer floor.

    Scale shape: one token hash agg builds the vocabulary (top-k via
    TakeOrdered, deterministic count-desc/token-asc tiebreak); the
    membership test is a BROADCAST left join of the token stream against
    the k-row vocab, then a per-source count agg — the corpus never
    shuffles on the token."""
    toks = documents.select("source", F.explode(tokens_col()).alias("token"))
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("tc"))
        .orderBy(F.desc("tc"), F.asc("token"))
        .limit(vocab_k)
        .select("token", F.lit(1).alias("__in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "token", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            "source",
            "n_tokens",
            "n_oov",
            F.expr("(n_oov * 1000000) div n_tokens").alias("oov_ppm"),
        )
    )


def script_mix(documents: DataFrame) -> DataFrame:
    """Charset/script quality screen — the cheap pre-langid pass a crawl
    pipeline runs to route documents (pure-ASCII English-ish vs
    mixed-script vs binary-ish junk): per doc, counts of non-ASCII,
    digit, uppercase, and whitespace characters plus the ASCII ratio.

    Every count is length(text) - length(regexp_replace(text, class, ''))
    — a character-class strip, identical semantics in Java regex and RE2,
    no explode, no shuffle; the ratio is ONE int/int IEEE divide with a
    nullif(0) empty-doc guard (cross-engine convention). Output:
    (doc_id, n_chars_m, n_non_ascii, n_digits, n_upper, n_ws,
    ascii_ratio)."""

    def strip_count(cls: str) -> Column:
        return (
            F.length("text") - F.length(F.regexp_replace("text", cls, ""))
        ).cast("bigint")

    n = F.length("text").cast("bigint")
    return documents.select(
        "doc_id",
        n.alias("n_chars_m"),
        strip_count(r"[^\x00-\x7f]").alias("n_non_ascii"),
        strip_count("[0-9]").alias("n_digits"),
        strip_count("[A-Z]").alias("n_upper"),
        strip_count(r"[ \t\n\r]").alias("n_ws"),
        (
            (n - strip_count(r"[^\x00-\x7f]"))
            / F.nullif(n, F.lit(0))
        ).alias("ascii_ratio"),
    )


def exact_stratified_sample(
    documents: DataFrame, k_per_source: int = SAMPLE_TARGET_PER_SOURCE
) -> DataFrame:
    """EXACT-quota per-source sample: exactly min(k, n_source) documents
    per source, chosen as the k smallest salted md5 hashes — the eval-set
    construction knob where quotas must be met to the row (contrast
    stratified_sample: growth-stable membership but only approximate
    counts). Deterministic under any shuffle (hash then doc_id ordering);
    adding documents to a source CAN rotate its picks — that is the price
    of exactness, stated here so callers pick the right tool.

    Scale shape: one shuffle keyed on source; the rank <= k filter over
    the window triggers Spark's WindowGroupLimit rewrite (partial
    per-partition top-k BEFORE the exchange, plan-shape-tested), so the
    shuffle carries at most k rows per source per input partition, not
    the corpus."""
    from pyspark.sql.window import Window

    h = F.expr("md5(concat('exact:', cast(doc_id as string)))")
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        documents.select("doc_id", "source", h.alias("h"))
        .withColumn("pick_rank", F.row_number().over(w))
        .filter(F.col("pick_rank") <= k_per_source)
        .select("doc_id", "source", F.col("pick_rank").cast("int").alias("pick_rank"))
    )


def bigram_lm_score(documents: DataFrame) -> DataFrame:
    """Corpus-trained bigram language-model surprise score — the KenLM-style
    perplexity filter of a pretraining pipeline (score each document by how
    predictable its token sequence is under a model trained on the corpus
    itself) with no external model artifact.

    Per adjacent token pair (w1, w2) the add-one-smoothed conditional
    probability is p = (C(w1,w2) + 1) / (C(w1) + V) where C(w1) counts
    bigram CONTEXTS (occurrences of w1 as a left token) and V is the
    distinct context vocabulary. The per-bigram surprise is the integer
    log2 bucket of 1/p — bit_length((C(w1)+V) div (C(w1,w2)+1)), the same
    ln-free convention as doc_quality_zipf — summed per document and
    normalized to milli-bits-per-bigram. Integer-exact end to end, so the
    DuckDB oracle matches bit-for-bit; rank-equivalent to float perplexity
    at the bucket granularity. High ppl_milli = surprising/gibberish text,
    low = repetitive/in-distribution — the filter thresholds both tails.

    Scale shape: ONE exploded (doc_id, w1, w2) relation (held — it feeds
    training counts AND scoring), two hash aggs for C(w1,w2) and C(w1)
    (map-side combine carries the Zipf head), V as a 1-row aggregate
    broadcast onto the scoring rows, and the counts joined back on their
    own keys. The w1 join key is exactly Zipf-skewed; AQE's skew split
    handles it, and a bounded vocabulary makes both count relations
    broadcastable. Docs with < 2 tokens have no bigrams and are excluded
    (stated contract; the oracle applies the same len >= 2 guard).
    Output: (doc_id, n_bigrams, sum_bits, ppl_milli)."""
    from ._cache import hold

    toks = documents.select("doc_id", tokens_col().alias("toks"))
    bg = hold(
        toks.filter(F.size("toks") >= 2).select(
            "doc_id",
            F.expr(
                "explode(transform(sequence(0, size(toks) - 2),"
                " i -> struct(toks[i] AS w1, toks[i + 1] AS w2)))"
            ).alias("b"),
        ).select("doc_id", "b.w1", "b.w2"),
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = c1.agg(F.count(F.lit(1)).alias("v"))
    return (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.length(F.expr("bin((c1 + v) div (c12 + 1))")).alias("bits"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_bigrams"),
            F.sum("bits").cast("bigint").alias("sum_bits"),
        )
        .withColumn(
            "ppl_milli", F.expr("(sum_bits * 1000) div n_bigrams").cast("bigint")
        )
    )


SYSTEMATIC_SAMPLE_PICKS = 200
SYSTEMATIC_BUCKET_SPAN = 25_000


def weighted_systematic_sample(
    documents: DataFrame,
    n_picks: int = SYSTEMATIC_SAMPLE_PICKS,
    bucket_span: int = SYSTEMATIC_BUCKET_SPAN,
) -> DataFrame:
    """EXACT weight-proportional systematic sample: lay every document's
    weight (n_chars) end to end along the doc_id order and pick the row
    under every multiple of step = total_weight div n_picks — the
    classic systematic (fixed-interval) sampler, size-proportional like
    PPS sampling but with zero variance in the realized quota and no
    randomness (token-budget construction wants "exactly this many
    chars' worth, spread evenly", not an expected value). Integer-exact:
    a row is picked iff its cumulative-weight interval (cum - w, cum]
    contains a multiple of step, i.e. cum div step > (cum - w) div step;
    rows heavier than step win multiple hits (n_hits) and zero-weight
    rows can never be picked.

    Scale shape: the global prefix sum is the textbook TWO-PHASE scan,
    not a single-partition window — phase 1 computes bucket-local
    cumulative sums with a window PARTITIONED by bucket (doc_id div
    bucket_span, so buckets are ordered and parallel); phase 2 prefix-sums
    the per-bucket totals (n_docs/bucket_span rows — a bounded relation,
    documented single-partition window) and broadcasts the offsets back.
    One keyed shuffle + one broadcast join; no row-level single-partition
    stage at any size. The total and step come from a 1-row aggregate
    broadcast cross join."""
    from pyspark.sql.window import Window

    from ._cache import hold

    w = hold(
        documents.select(
            "doc_id",
            F.greatest(F.coalesce(F.col("n_chars"), F.lit(0)), F.lit(0))
            .cast("bigint")
            .alias("w"),
            (F.col("doc_id") / bucket_span).cast("bigint").alias("bucket"),
        ),
    )
    local = w.withColumn(
        "local_cum",
        F.sum("w").over(
            Window.partitionBy("bucket")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    totals = w.groupBy("bucket").agg(F.sum("w").alias("bucket_w"))
    offsets = totals.withColumn(
        "offset",
        F.coalesce(
            F.sum("bucket_w").over(
                Window.orderBy("bucket").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("bucket", "offset")
    step = w.agg(
        F.greatest(
            F.expr(f"sum(w) div {n_picks}"), F.lit(1)
        ).alias("step")
    )
    return (
        local.join(F.broadcast(offsets), "bucket")
        .crossJoin(F.broadcast(step))
        .select(
            "doc_id",
            F.col("w").alias("weight"),
            (F.col("offset") + F.col("local_cum")).alias("cum_chars"),
            "step",
        )
        .filter(
            F.expr("cum_chars div step > (cum_chars - weight) div step")
        )
        .select(
            "doc_id",
            "weight",
            F.col("cum_chars").cast("bigint").alias("cum_chars"),
            F.expr(
                "cast(cum_chars div step - (cum_chars - weight) div step"
                " as int)"
            ).alias("n_hits"),
        )
    )


BM25_TOP_K = 20
BM25_QUERY_TERMS = ("spark", "join", "query", "window", "stream")


def bm25_topk(
    documents: DataFrame,
    query_terms: tuple[str, ...] = BM25_QUERY_TERMS,
    k: int = BM25_TOP_K,
) -> DataFrame:
    """BM25 top-k retrieval (Robertson/Sparck Jones) over the corpus for a
    pinned query-term set — the relevance-ranked search primitive of a
    curation pipeline (pull the documents most about X), stated in the
    engine's integer-exact, ln-free convention so the DuckDB oracle
    matches bit-for-bit:

      * idf is the log2 BUCKET of the BM25+ odds, computed exactly on
        integers: floor(log2((N - df + 1/2)/(df + 1/2) + 1)) ==
        bit_length((2N + 2) div (2df + 1)) - 1 (floor(log2(floor(x)))
        == floor(log2(x)) for x >= 1, and the +1 keeps it >= 0 for
        corpus-wide terms) — the same bin()-length idiom as
        doc_quality_zipf / bigram_lm_score.
      * the tf saturation with k1 = 6/5, b = 3/4 is EXACTLY rational:
        tf(k1+1)/(tf + k1(1 - b + b*dl*N/T)) ==
        44*tf*T / (20*tf*T + 6*T + 18*dl*N) with T = total corpus
        tokens, dl = doc length — scored in ppm by one bigint division.
      * contribution = idf_bucket * tf_ppm; the per-doc score is an exact
        bigint sum — partial-aggregation order can never flip a bit.

    Scale shape: the token explode is FILTERED to the query terms before
    any shuffle (a |Q|-membership check on the scan — the relation that
    aggregates is hits, not tokens); df/totals are broadcast 1-row/|Q|-row
    aggregates; dl is a map-side size() per doc. Top-k plans as
    TakeOrderedAndProject (per-partition heaps), with the rank window
    applied to the k-row result only. At web scale (tf*T beyond 2^53*...)
    swap the exact T products for a precomputed avgdl rational with the
    same div — documented, not needed at any gated SF (peak product here
    is ~1e16 of int64's 9.2e18).

    Output: (doc_id, n_hits, score, rank), rank 1..k, ties by doc_id.
    """
    from ._cache import hold

    qt = sorted({t.lower() for t in query_terms})
    toks = documents.select("doc_id", tokens_col().alias("toks"))
    dl = hold(
        toks.select("doc_id", F.size("toks").cast("bigint").alias("dl")),
        # lazy hold (r13): feeds the totals aggregate AND the scoring join
    )
    tf = (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(qt))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    return _bm25_rank_from_tf(tf, dl, k)


def _bm25_rank_from_tf(tf: DataFrame, dl: DataFrame, k: int) -> DataFrame:
    """The BM25 scoring tail shared by bm25_topk and the PRF second pass:
    per-term df, the exact-rational saturation x idf-bucket contribution,
    per-doc bigint sum, TakeOrdered top-k with the rank window on the
    k-row result only. ``tf`` is (doc_id, term, tf); ``dl`` the HELD
    (doc_id, dl) relation (its totals aggregate rides the same cache)."""
    totals = dl.agg(
        F.sum("dl").alias("t_tokens"), F.count(F.lit(1)).alias("n_docs")
    )
    df_rel = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    scored = (
        tf.join(F.broadcast(df_rel), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            (
                (F.length(F.expr("bin((2 * n_docs + 2) div (2 * df + 1))")) - 1)
                * F.expr(
                    "(44 * tf * t_tokens * 1000000) div"
                    " (20 * tf * t_tokens + 6 * t_tokens + 18 * dl * n_docs)"
                )
            ).cast("bigint").alias("contrib"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_hits"),
        F.sum("contrib").cast("bigint").alias("score"),
    )
    top = per_doc.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


#: pseudo-relevance feedback: docs fed back and expansion terms added
PRF_FEEDBACK_DOCS = 5
PRF_EXPANSION_TERMS = 3


def bm25_prf_search(
    documents: DataFrame,
    query_terms: tuple[str, ...] = BM25_QUERY_TERMS,
    k: int = BM25_TOP_K,
    fb_docs: int = PRF_FEEDBACK_DOCS,
    fb_terms: int = PRF_EXPANSION_TERMS,
) -> DataFrame:
    """BM25 with PSEUDO-RELEVANCE-FEEDBACK query expansion (the RM3
    recipe, Lavrenko & Croft 2001, in the board's deterministic integer
    convention): run the base BM25, take the top ``fb_docs`` documents as
    the feedback set, add the ``fb_terms`` most frequent feedback-set
    terms (total tf, ties alphabetically) that are not already query
    terms, and rescore the corpus with the expanded term set — the
    classic one-round recall amplifier of a retrieval pipeline.

    Everything reuses the exact-integer BM25 tail (_bm25_rank_from_tf),
    so the DuckDB oracle restates both passes bit-for-bit. Scale shape:
    both passes filter the token explode to a bounded term set before
    any shuffle; the feedback set is ``fb_docs`` rows broadcast into a
    semi-join; the expansion pick is a vocab-sized agg cut by
    TakeOrdered.

    Output: (doc_id, n_hits, score, rank) — the expanded-query ranking."""
    from ._cache import hold

    qt = sorted({t.lower() for t in query_terms})
    toks = documents.select("doc_id", tokens_col().alias("toks"))
    dl = hold(
        toks.select("doc_id", F.size("toks").cast("bigint").alias("dl")),
    )
    # lazy hold: the three consumers (base tf, expansion pick, expanded
    # tf) run in SEQUENTIAL jobs, so first-use population is race-free
    # and we skip the extra eager materialization pass of a corpus-token
    # relation (the one cache here whose size scales with the corpus)
    tok = hold(toks.select("doc_id", F.explode("toks").alias("term")))
    tf1 = (
        tok.filter(F.col("term").isin(qt))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    base = _bm25_rank_from_tf(tf1, dl, k=fb_docs)
    fb = base.select(F.col("doc_id").alias("fb_doc"))
    expansion = (
        tok.join(
            F.broadcast(fb), F.col("doc_id") == F.col("fb_doc"), "semi"
        )
        .filter(~F.col("term").isin(qt))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("fb_tf"))
        .orderBy(F.col("fb_tf").desc(), F.col("term").asc())
        .limit(fb_terms)
        .select("term")
    )
    base_terms = documents.sparkSession.createDataFrame(
        [(t,) for t in qt], "term string"
    )
    terms = base_terms.unionByName(expansion).distinct()
    tf2 = (
        tok.join(F.broadcast(terms), "term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    return _bm25_rank_from_tf(tf2, dl, k=k)


# ---------------------------------------------------------------------------
# HTML/markup -> text extraction (round-12 verdict "Next round" #3):
# the missing FIRST stage of a web-corpus pipeline — every downstream
# quality screen (repetition_stats, doc_quality_zipf, dedup) assumes
# extracted plain text already exists.
# ---------------------------------------------------------------------------

# The deterministic extraction spec, shared VERBATIM with the DuckDB
# oracle (the PNG-codec discipline: no external parser on either side).
# Patterns avoid backreferences and \v-class corners so Java regex
# (Spark) and RE2 (DuckDB) agree character-for-character; (?s)/(?i)
# inline flags are supported by both. Stated simplifications (identical
# on both sides, law-tested): a tag ends at the FIRST '>' (attribute
# values containing '>' split the tag); an unclosed '<' run stays
# literal text; CDATA sections are unwrapped BEFORE tag stripping, so
# angle-bracket runs inside CDATA are treated as markup.
MARKUP_COMMENT = r"(?s)<!--.*?-->"
MARKUP_SCRIPT = r"(?is)<script[^>]*>.*?</script>"
MARKUP_STYLE = r"(?is)<style[^>]*>.*?</style>"
MARKUP_CDATA = r"(?s)<!\[CDATA\[(.*?)\]\]>"
MARKUP_TAG = r"<[^>]*>"
MARKUP_LINK = r"(?i)<a[\s>]"
#: boilerplate containers whose extracted-text share is reported —
#: one pattern per tag (no backreference, so RE2 can run the same spec)
MARKUP_BOILER_TAGS = ("nav", "footer", "aside")
#: entity decode table; '&amp;' deliberately LAST so '&amp;lt;' decodes
#: to the literal '&lt;' (single-pass HTML semantics), never to '<'
MARKUP_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def _markup_pre(col: F.Column) -> F.Column:
    """Comments, script blocks and style blocks removed (content and
    all), CDATA unwrapped to its inner text — the residue whose tags
    are the real markup elements."""
    h = F.regexp_replace(col, MARKUP_COMMENT, " ")
    h = F.regexp_replace(h, MARKUP_SCRIPT, " ")
    h = F.regexp_replace(h, MARKUP_STYLE, " ")
    return F.regexp_replace(h, MARKUP_CDATA, "$1")


def _markup_text(col: F.Column) -> F.Column:
    """Tags -> spaces, entities decoded, whitespace collapsed+trimmed."""
    t = F.regexp_replace(col, MARKUP_TAG, " ")
    for ent, ch in MARKUP_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def markup_extract(documents: DataFrame, html_col: str = "html") -> DataFrame:
    """Markup -> text extraction with per-document structure stats: the
    tag-strip + entity-decode + whitespace-collapse chain above, plus
    the density signals a boilerplate screen filters on —

      html_len / n_tags / n_links / n_comments  (structure counts; tags
          and links counted on the comment/script/style-free residue),
      text / text_len                           (the extracted text),
      text_density_ppm = text_len * 1e6 div html_len  (markup-heavy
          pages score low — the classic text-density boilerplate cue),
      boiler_ppm = chars of text inside <nav>/<footer>/<aside> blocks
          * 1e6 div text_len  (chrome-dominated pages score high).

    Everything is JVM-side codegen expressions (regexp_replace /
    regexp_extract_all / replace) — zero Python in the hot path; the
    100 TB shape is a rewrite pass fused into the scan, exactly like
    pii_redact. Exact integer ppm arithmetic (the engine's ln-free
    idiom), so the DuckDB oracle restates the whole chain bit-for-bit.
    """
    boiler_raw = F.concat_ws(
        " ",
        *[
            F.array_join(
                F.regexp_extract_all(
                    "h", F.lit(rf"(?is)<{t}[^>]*>.*?</{t}>"), 0
                ),
                " ",
            )
            for t in MARKUP_BOILER_TAGS
        ],
    )
    d = documents.select(
        "doc_id", F.col(html_col).alias("h0")
    ).withColumn("h", _markup_pre(F.col("h0")))
    return (
        d.select(
            "doc_id",
            F.length("h0").cast("int").alias("html_len"),
            F.size(F.regexp_extract_all("h", F.lit(MARKUP_TAG), 0))
            .cast("int")
            .alias("n_tags"),
            F.size(F.regexp_extract_all("h", F.lit(MARKUP_LINK), 0))
            .cast("int")
            .alias("n_links"),
            F.size(F.regexp_extract_all("h0", F.lit(MARKUP_COMMENT), 0))
            .cast("int")
            .alias("n_comments"),
            _markup_text(F.col("h")).alias("text"),
            F.length(_markup_text(boiler_raw)).cast("long").alias("boiler_len"),
        )
        .select(
            "doc_id",
            "html_len",
            "n_tags",
            "n_links",
            "n_comments",
            "text",
            F.length("text").cast("int").alias("text_len"),
            F.expr(
                "cast(length(text) as bigint) * 1000000"
                " div greatest(cast(html_len as bigint), 1)"
            ).alias("text_density_ppm"),
            F.expr(
                "boiler_len * 1000000"
                " div greatest(cast(length(text) as bigint), 1)"
            ).alias("boiler_ppm"),
        )
    )
